package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** FIXED order-preserving bucket of a double: the top `bits` bits of
  * the IEEE-754 total-order transform (`doubleToRawLongBits` with the
  * classic sign-flip that makes the long ordering match the double
  * ordering). Unlike [[QuantileBucket]] this needs NO cut points — the
  * mapping is a pure function of the value — so a distributed rank can
  * compute exact per-bucket counts in the SAME aggregation pass that
  * probes value histograms, instead of first running a quantile job
  * and then an offsets pass over the data (guide §2.4: one pass
  * removed outright). Monotone: v1 < v2 ⇒ bucket(v1) ≤ bucket(v2);
  * equal values (including -0.0 vs 0.0, normalized here exactly like
  * Spark's comparisons) always share a bucket, so rank tie groups
  * never split across buckets. NaN normalizes to the canonical bit
  * pattern and buckets greatest (Spark's NaN ordering); null in →
  * null out.
  *
  * With the default 18 bits the id space is sign+exponent+6 mantissa
  * bits: ≤ 64 sub-buckets per binade, at most 262144 ids total but
  * only as many ACTIVE ids as the data's spread occupies (a column
  * inside one binade uses ≤ 64). Balance is a data property — callers
  * gate on the observed max-bucket share and fall back to quantile
  * cuts when a column concentrates inside ≲2⁻⁶ relative width. */
case class SortableBucket(child: Expression, bits: Int = 18)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sortable_bucket"

  override def nullSafeEval(a: Any): Any =
    SortableBucket.bucketOf(a.asInstanceOf[Double], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToRawLongBits(
         |  Double.isNaN($a) ? Double.NaN : ($a == 0.0d ? 0.0d : $a));
         |$b = $b ^ (($b >> 63) | Long.MIN_VALUE);
         |${ev.value} = (int) ($b >>> ${64 - bits});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortableBucket {
  import org.apache.spark.sql.GraftSqlShim

  /** The scalar mapping (shared by eval, codegen mirrors it): normalize
    * -0.0 → 0.0 (Spark compares them equal) and NaN → canonical NaN
    * (parquet payload bits must not split the NaN tie group), flip to
    * the total-order long, take the top `bits` bits. */
  def bucketOf(v: Double, bits: Int): Int = {
    val norm = if (v.isNaN) Double.NaN else if (v == 0.0d) 0.0d else v
    val raw = java.lang.Double.doubleToRawLongBits(norm)
    val flipped = raw ^ ((raw >> 63) | Long.MinValue)
    (flipped >>> (64 - bits)).toInt
  }

  /** Column form; input cast to double. */
  def sortableBucket(c: Column, bits: Int = 18): Column =
    GraftSqlShim.column(SortableBucket(
      GraftSqlShim.expression(c.cast("double")), bits))
}
