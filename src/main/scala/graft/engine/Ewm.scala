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

  // ---- pairwise ewm.cov / ewm.corr -----------------------------------

  /** Pairwise decayed co-moment buffer. Weights accrue only on
    * pairwise-complete rows (pandas masks a pair if EITHER side is NaN);
    * with ignore_na=False an incomplete row still advances the decay
    * clock — same convention as the univariate [[Buf]]. `cnt` counts
    * complete pairs UNdecayed (pandas' nobs): sample cov/corr are
    * undefined below 2 observations, and the sw^2-sw2 denominator can't
    * express that gate robustly (for non-binary-exact alphas the two
    * d^k products round differently, leaving an ulp-sized positive
    * denominator that would amplify a cancelled co-moment into junk
    * where pandas emits NaN). */
  case class Buf2(sw: Double, sw2: Double, sx: Double, sy: Double,
                  sxy: Double, sxx: Double, syy: Double, n: Long, cnt: Long)

  private def step2(b: Buf2, x: java.lang.Double, y: java.lang.Double,
                    alpha: Double, ignoreNa: Boolean): Buf2 = {
    val d = 1.0 - alpha
    val missing = x == null || x.isNaN || y == null || y.isNaN
    if (missing) {
      if (ignoreNa) b
      else Buf2(b.sw * d, b.sw2 * d * d, b.sx * d, b.sy * d,
                b.sxy * d, b.sxx * d, b.syy * d, b.n + 1, b.cnt)
    } else
      Buf2(b.sw * d + 1.0, b.sw2 * d * d + 1.0,
           b.sx * d + x, b.sy * d + y, b.sxy * d + x * y,
           b.sxx * d + x * x, b.syy * d + y * y, b.n + 1, b.cnt + 1)
  }

  private def combine2(l: Buf2, r: Buf2, alpha: Double): Buf2 = {
    val d = math.pow(1.0 - alpha, r.n.toDouble)
    Buf2(l.sw * d + r.sw, l.sw2 * d * d + r.sw2,
         l.sx * d + r.sx, l.sy * d + r.sy, l.sxy * d + r.sxy,
         l.sxx * d + r.sxx, l.syy * d + r.syy, l.n + r.n, l.cnt + r.cnt)
  }

  /** Two-column input shape for the pairwise Aggregators; udaf() maps
    * `apply(x, y)` onto the two fields positionally. */
  case class Pair(x: java.lang.Double, y: java.lang.Double)

  private abstract class EwmAgg2(alpha: Double, ignoreNa: Boolean)
      extends Aggregator[Pair, Buf2, java.lang.Double] {
    def zero: Buf2 = Buf2(0, 0, 0, 0, 0, 0, 0, 0L, 0L)
    def reduce(b: Buf2, a: Pair): Buf2 = step2(b, a.x, a.y, alpha, ignoreNa)
    def merge(b1: Buf2, b2: Buf2): Buf2 = combine2(b1, b2, alpha)
    def bufferEncoder: Encoder[Buf2] = Encoders.product[Buf2]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** pandas `ewm.cov(other, bias=False)`: biased decayed co-moment
    * debiased by sw^2 / (sw^2 - sw2) — identical factor to [[varAgg]]
    * but over the PAIRWISE weight sums. */
  def covAgg(alpha: Double, ignoreNa: Boolean = false)
    : Aggregator[Pair, Buf2, java.lang.Double] =
    new EwmAgg2(alpha, ignoreNa) {
      def finish(b: Buf2): java.lang.Double = {
        val denom = b.sw * b.sw - b.sw2
        if (b.cnt < 2 || b.sw <= 0 || denom <= 0) null
        else {
          val mx = b.sx / b.sw; val my = b.sy / b.sw
          (b.sw * b.sw / denom) * (b.sxy / b.sw - mx * my)
        }
      }
    }

  /** pandas `ewm.corr(other)`: ratio of BIASED co-moments (the debias
    * factors cancel, so corr is bias-parameter-free in pandas too). */
  def corrAgg(alpha: Double, ignoreNa: Boolean = false)
    : Aggregator[Pair, Buf2, java.lang.Double] =
    new EwmAgg2(alpha, ignoreNa) {
      def finish(b: Buf2): java.lang.Double = {
        val denom = b.sw * b.sw - b.sw2
        if (b.cnt < 2 || b.sw <= 0 || denom <= 0) null
        else {
          val mx = b.sx / b.sw; val my = b.sy / b.sw
          val vx = b.sxx / b.sw - mx * mx
          val vy = b.syy / b.sw - my * my
          val c = b.sxy / b.sw - mx * my
          // raw-moment cancellation leaves ~eps*mean^2 where a constant
          // window's true variance is 0 (pandas' centered online form is
          // exactly 0 -> NaN); gate on a RELATIVE epsilon so degenerate
          // windows null out instead of emitting noise-scaled corr.
          // 1e-14 ≈ actual double-cancellation scale (ADVICE r8: the old
          // 1e-12 nulled genuine tiny-relative-variance series too)
          val ex = math.max(b.sxx / b.sw, mx * mx) * 1e-14
          val ey = math.max(b.syy / b.sw, my * my) * 1e-14
          if (vx <= ex || vy <= ey) null else c / math.sqrt(vx * vy)
        }
      }
    }

  def cov(x: Column, y: Column, w: WindowSpec, alpha: Double,
          ignoreNa: Boolean = false): Column =
    udaf(covAgg(alpha, ignoreNa)).apply(x, y).over(running(w))
  def corr(x: Column, y: Column, w: WindowSpec, alpha: Double,
           ignoreNa: Boolean = false): Column =
    udaf(corrAgg(alpha, ignoreNa)).apply(x, y).over(running(w))

  // ---- ewm(times=, halflife=timedelta) --------------------------------

  /** Time-decayed buffer: weights are a pure function of TIME DISTANCE
    * (w_j at evaluation time t = 0.5^((t - t_j)/halflife)), so nulls
    * neither contribute nor matter to the clock — the decay telescopes
    * over actual timestamp deltas instead of row positions. `lastT`
    * rides in microseconds-as-double (exact to 2^53 µs ≈ 285 years). */
  case class TBuf(sw: Double, swx: Double, lastT: Double, n: Long)

  /** (timestamp µs, value) input row for the times-aware Aggregator. */
  case class TPoint(t: java.lang.Double, x: java.lang.Double)

  /** pandas `ewm(times=..., halflife=Timedelta).mean()` — the only ewm
    * op pandas defines for irregular times. Same running-window
    * evaluation as [[meanAgg]]; the recurrence multiplies by
    * 0.5^(Δt/halflife) ≤ 1 per step (rows arrive time-ordered via the
    * window's orderBy), so it is overflow-free for arbitrary spans,
    * unlike the closed-form 0.5^(-t/hl) rebase. merge() rebases the
    * earlier buffer onto the later one's clock (order-insensitive:
    * the decay factor is always ≤ 1, never an overflow-prone
    * amplification). NOTE: reduce() still assumes rows arrive
    * time-ordered (each step decays relative to the previous row's
    * timestamp), so this is only a valid GROUPED aggregate when each
    * partition's rows are pre-sorted by `times` — the running-window
    * path (`meanTimes` over `running(w)`) guarantees that; arbitrary
    * groupBy input does not. */
  def meanTimesAgg(halflifeMicros: Double)
    : Aggregator[TPoint, TBuf, java.lang.Double] =
    new Aggregator[TPoint, TBuf, java.lang.Double] {
      def zero: TBuf = TBuf(0, 0, Double.NaN, 0L)
      def reduce(b: TBuf, a: TPoint): TBuf = {
        if (a.t == null || a.x == null || a.x.isNaN) b
        else if (b.n == 0L) TBuf(1.0, a.x, a.t, 1L)
        else {
          val d = math.pow(0.5, (a.t - b.lastT) / halflifeMicros)
          TBuf(b.sw * d + 1.0, b.swx * d + a.x, a.t, b.n + 1)
        }
      }
      def merge(l: TBuf, r: TBuf): TBuf =
        if (l.n == 0L) r
        else if (r.n == 0L) l
        else {
          // rebase BOTH buffers to the later clock so the decay factor
          // is ≤ 1 whichever order partials arrive in (ADVICE r9)
          val tMax = math.max(l.lastT, r.lastT)
          val dl = math.pow(0.5, (tMax - l.lastT) / halflifeMicros)
          val dr = math.pow(0.5, (tMax - r.lastT) / halflifeMicros)
          TBuf(l.sw * dl + r.sw * dr, l.swx * dl + r.swx * dr,
            tMax, l.n + r.n)
        }
      def finish(b: TBuf): java.lang.Double =
        if (b.sw <= 0) null else b.swx / b.sw
      def bufferEncoder: Encoder[TBuf] = Encoders.product[TBuf]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** `times` is any timestamp-castable column; `halflifeMicros` the
    * pandas halflife Timedelta in microseconds. */
  def meanTimes(c: Column, times: Column, w: WindowSpec,
                halflifeMicros: Double): Column =
    udaf(meanTimesAgg(halflifeMicros))
      .apply(Core.usOf(times).cast("double"), c).over(running(w))
}
