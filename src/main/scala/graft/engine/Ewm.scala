package graft.engine

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving aggregates (pandas `ewm`).
  *
  * Reference: `ParallelEWM` (`/root/reference/parallel_pandas/core/
  * parallel_window.py:282-305`), ops mean/sum/std/var (`main.py:46`),
  * `adjust=True` and `bias=False` pandas defaults.
  *
  * The recurrence is sequential, so it is implemented as mergeable
  * Aggregators evaluated as running window functions
  * (`rowsBetween(unboundedPreceding, currentRow)`): Spark's WindowExec
  * grows that frame incrementally, giving O(n) per partition; the
  * `merge` implementation additionally makes the same Aggregator usable
  * as a grouped aggregate (last-value queries) with map-side partials.
  *
  * Numerics: the decayed-sum recurrence `s <- s*(1-a) + x` only ever
  * multiplies by (1-a) < 1 — stable for arbitrarily long series, unlike
  * the closed-form `(1-a)^(-i)` cumulative trick which overflows.
  *
  * pandas `ignore_na=False` (default): a null advances the decay clock
  * but contributes no weight — implemented by decaying all sums on null.
  */
object Ewm {

  /** pandas ewm decay parameterizations — all reduce to alpha. */
  def alphaFromSpan(span: Double): Double = 2.0 / (span + 1.0)
  def alphaFromCom(com: Double): Double = 1.0 / (1.0 + com)
  def alphaFromHalflife(hl: Double): Double = 1.0 - math.exp(-math.log(2.0) / hl)

  /** (decayed weight sum, decayed squared-weight sum, decayed x sum,
    * decayed x^2 sum, row count) */
  case class Buf(sw: Double, sw2: Double, swx: Double, swx2: Double, n: Long)

  private def step(b: Buf, x: java.lang.Double, alpha: Double,
                   ignoreNa: Boolean = false): Buf = {
    val d = 1.0 - alpha
    if (x == null || x.isNaN) {
      // ignore_na=True: nulls advance nothing — n counts VALID obs, so
      // combine()'s decay-by-right-count stays correct in this mode too
      if (ignoreNa) b
      else Buf(b.sw * d, b.sw2 * d * d, b.swx * d, b.swx2 * d, b.n + 1)
    } else
      Buf(b.sw * d + 1.0, b.sw2 * d * d + 1.0,
          b.swx * d + x, b.swx2 * d + x * x, b.n + 1)
  }

  /** Merging two decayed buffers: right side is "later"; left sums decay
    * by the right side's row count (weights are position-based). */
  private def combine(l: Buf, r: Buf, alpha: Double): Buf = {
    val d = math.pow(1.0 - alpha, r.n.toDouble)
    Buf(l.sw * d + r.sw, l.sw2 * d * d + r.sw2,
        l.swx * d + r.swx, l.swx2 * d + r.swx2, l.n + r.n)
  }

  private abstract class EwmAgg(alpha: Double, ignoreNa: Boolean = false)
      extends Aggregator[java.lang.Double, Buf, java.lang.Double] {
    def zero: Buf = Buf(0, 0, 0, 0, 0L)
    def reduce(b: Buf, a: java.lang.Double): Buf = step(b, a, alpha, ignoreNa)
    def merge(b1: Buf, b2: Buf): Buf = combine(b1, b2, alpha)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  def meanAgg(alpha: Double, ignoreNa: Boolean = false)
    : Aggregator[java.lang.Double, Buf, java.lang.Double] =
    new EwmAgg(alpha, ignoreNa) {
      def finish(b: Buf): java.lang.Double =
        if (b.sw <= 0) null else b.swx / b.sw
    }

  /** pandas ewm.sum = decayed sum (adjust=True). */
  def sumAgg(alpha: Double, ignoreNa: Boolean = false)
    : Aggregator[java.lang.Double, Buf, java.lang.Double] =
    new EwmAgg(alpha, ignoreNa) {
      def finish(b: Buf): java.lang.Double = if (b.n == 0) null else b.swx
    }

  /** bias=False (pandas default): debias by sw^2 / (sw^2 - sw2). */
  def varAgg(alpha: Double, ignoreNa: Boolean = false)
    : Aggregator[java.lang.Double, Buf, java.lang.Double] =
    new EwmAgg(alpha, ignoreNa) {
      def finish(b: Buf): java.lang.Double = {
        val denom = b.sw * b.sw - b.sw2
        if (b.sw <= 0 || denom <= 0) null
        else {
          val mean = b.swx / b.sw
          val biased = b.swx2 / b.sw - mean * mean
          (b.sw * b.sw / denom) * biased
        }
      }
    }

  private def running(w: WindowSpec) =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  def mean(c: Column, w: WindowSpec, alpha: Double,
           ignoreNa: Boolean = false): Column =
    udaf(meanAgg(alpha, ignoreNa)).apply(c).over(running(w))
  def sum(c: Column, w: WindowSpec, alpha: Double,
          ignoreNa: Boolean = false): Column =
    udaf(sumAgg(alpha, ignoreNa)).apply(c).over(running(w))
  def variance(c: Column, w: WindowSpec, alpha: Double,
               ignoreNa: Boolean = false): Column =
    udaf(varAgg(alpha, ignoreNa)).apply(c).over(running(w))
  def std(c: Column, w: WindowSpec, alpha: Double,
          ignoreNa: Boolean = false): Column =
    sqrt(variance(c, w, alpha, ignoreNa))
}
