package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (pandas `str.normalize(form)`; reference proxy
  * `parallel_str_dt.py:91-116`): NFC/NFD/NFKC/NFKD via
  * `java.text.Normalizer` — the one str-accessor op the JVM provides
  * whole but Spark exposes no builtin for. A native expression (not a
  * UDF) so it stays inside WholeStageCodegen like the rest of the
  * accessor: per-row cost is one Normalizer call, zero serialization.
  * Already-normalized ASCII fast-path: `Normalizer.isNormalized` on the
  * decoded string short-circuits the rebuild. Null in -> null out. */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with ExpectsInputTypes {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"str.normalize: unknown form '$form'")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, f)) a
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", f, "java.text.Normalizer$Form")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $a.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, $formRef)
         |  ? $a
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, $formRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  import org.apache.spark.sql.GraftSqlShim

  def normalize(c: Column, form: String): Column =
    GraftSqlShim.column(UnicodeNormalize(GraftSqlShim.expression(c), form))
}
