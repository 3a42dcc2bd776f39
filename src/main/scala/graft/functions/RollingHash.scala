package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels callable from generated code. */
object HashKernels {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 32 bits of md5(token) as an unsigned value in a long —
    * bit-identical to `('0x' || substr(md5(tok), 1, 8))::BIGINT` in the
    * oracle engine and to the hex-prefix parses in [[graft.pipeline.Dedup]]. */
  def md5Prefix32(s: UTF8String): Long = {
    if (s == null) return 0L
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Order-sensitive polynomial rolling hash of a token array:
  * `h_i = (h_{i-1} * base + md5prefix32(tok_i)) mod modulus`, h_0 = 0.
  *
  * This is the sequence-sensitive complement of the sorted-bag
  * fingerprint in [[graft.pipeline.TextAnalysis.fingerprint]]: two
  * documents with the same words in a different order fingerprint
  * differently here. Native expression with codegen (see
  * [[DotProduct]] for why not a UDF): the whole fold runs as one
  * compiled loop over the ArrayData, one md5 per token via a
  * thread-local digest.
  *
  * Default base/modulus (1000003, 2^31-1) keep every intermediate
  * product under 2^52, so the same recurrence is computable without
  * overflow in any 64-bit-integer engine — that is what makes the
  * DuckDB `list_reduce` oracle bit-identical. */
case class RollingHash(child: Expression,
                       base: Long = 1000003L,
                       modulus: Long = 2147483647L)
  extends UnaryExpression with ExpectsInputTypes {

  require(modulus > 0 && base > 0 &&
    (modulus - 1) * base + 0xffffffffL < Long.MaxValue,
    "base*modulus must fit in a long")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * base + HashKernels.md5Prefix32(arr.getUTF8String(i))) % modulus
      i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $a.numElements();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${base}L +
         |    graft.functions.HashKernels.md5Prefix32($a.getUTF8String($i)))
         |    % ${modulus}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftSqlShim

  def apply(tokens: Column): Column =
    GraftSqlShim.column(RollingHash(GraftSqlShim.expression(tokens)))
}
