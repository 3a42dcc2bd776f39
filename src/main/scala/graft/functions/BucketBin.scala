package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Bucket index of a double against a SORTED, DEDUPED cut-point array:
  * the count of cuts strictly below the value (binary search), i.e.
  * exactly `Σ (v > cut_i ? 1 : 0)` — the indicator-sum the bucketed
  * rank/prefix-sum paths previously built as an O(cuts) nested-when
  * chain. O(log cuts) per row, whole-stage codegen'd, and the cut array
  * is a single referenced object instead of ~cuts literal branches in
  * the generated code.
  *
  * NaN buckets past the last cut (`Arrays.binarySearch` orders NaN
  * greatest — the same "NaN is largest" ordering Spark's comparisons
  * use); null in -> null out. */
case class QuantileBucket(child: Expression, cuts: Array[Double])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bucket_bin"

  override def nullSafeEval(a: Any): Any = {
    val idx = java.util.Arrays.binarySearch(cuts, a.asInstanceOf[Double])
    if (idx >= 0) idx else -idx - 1
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val idx = ctx.freshName("idx")
      s"""
         |final int $idx = java.util.Arrays.binarySearch($cutsRef, $a);
         |${ev.value} = $idx >= 0 ? $idx : -$idx - 1;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketBin {
  import org.apache.spark.sql.GraftSqlShim

  /** Column form; the input is cast to double (cuts are doubles). */
  def bucketBin(c: Column, cuts: Array[Double]): Column =
    GraftSqlShim.column(QuantileBucket(
      GraftSqlShim.expression(c.cast("double")), cuts))
}
