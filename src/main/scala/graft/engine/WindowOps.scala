package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Rolling / expanding window operators, row-count and time-offset,
  * plain and grouped.
  *
  * Reference: `/root/reference/parallel_pandas/core/parallel_window.py`
  * (rolling ops `:140-197`, expanding `:262-275`, grouped mixin
  * `:216-255`, time-window chunking `tools.py:8-36`). The reference's
  * overlap-chunk-trim machinery disappears entirely: Spark's WindowExec
  * sorts within partitions and evaluates frames natively.
  *
  * pandas parity points:
  *   - rolling default `min_periods = window` -> first n-1 rows null;
  *     expanding default `min_periods = 1`. Gated via `count(...) over w`.
  *   - grouped variants are the same expressions with
  *     `Window.partitionBy(groupKeys)` — one shuffle on the keys, then
  *     per-partition sort; scales linearly with executors.
  *
  * Time windows: pandas `rolling("1h")` covers `(ts - 1h, ts]`
  * (closed='right'). A Spark `rangeBetween(-(ms-1), 0)` over epoch-millis
  * reproduces the open left edge at millisecond resolution.
  */
object WindowOps {

  /** Trailing row window of size n ending at the current row. */
  def rollingSpec(w: WindowSpec, n: Int): WindowSpec =
    w.rowsBetween(-(n - 1), Window.currentRow)

  /** pandas `rolling(n, center=True)`: the same n-row frame with the
    * result labeled at the center — frame `[-(n-1)+k, k]` with
    * `k = (n-1)/2` (even n leans left, like pandas). */
  def rollingSpecCentered(w: WindowSpec, n: Int): WindowSpec = {
    val k = (n - 1) / 2
    w.rowsBetween(-(n - 1) + k, k)
  }

  def expandingSpec(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Trailing time window over an epoch-micros ordering column
    * (`unix_micros(ts)`): pandas-closed-right `(ts - offset, ts]`. */
  def timeSpec(w: WindowSpec, offsetMicros: Long): WindowSpec =
    w.rangeBetween(-(offsetMicros - 1), 0)

  /** pandas `rolling(window=offset, closed=)` — all four interval
    * closures, as micro-exact range frames over the epoch-micros
    * ordering column:
    *   right   (t-w, t]   (pandas default for offset windows)
    *   both    [t-w, t]
    *   left    [t-w, t)
    *   neither (t-w, t)
    */
  def timeSpecClosed(w: WindowSpec, offsetMicros: Long,
                     closed: String): WindowSpec = closed match {
    case "right" => w.rangeBetween(-(offsetMicros - 1), 0)
    case "both" => w.rangeBetween(-offsetMicros, 0)
    case "left" => w.rangeBetween(-offsetMicros, -1)
    case "neither" => w.rangeBetween(-(offsetMicros - 1), -1)
    case other => throw new IllegalArgumentException(
      s"rolling closed=: unknown '$other' (right|both|left|neither)")
  }

  /** min_periods gate: null until enough non-null values in the frame. */
  def gated(c: Column, w: WindowSpec, minPeriods: Int)(agg: Column => Column): Column =
    when(count(c).over(w) >= minPeriods, agg(c).over(w))

  /** pandas `rolling(step=k)` row selection: keep positions 0, k, 2k, …
    * per group (0-indexed over the same ordering the frame uses). The
    * rolling expressions themselves are unchanged — step is a FILTER on
    * which result rows survive, evaluated in the same WindowExec pass
    * (row_number shares the partition/order spec, so no extra shuffle).
    * Compose: `df.select(..., rMean(c, rollingSpec(w, n), mp))
    * .filter(stepKeep(w, k))`. */
  def stepKeep(w: WindowSpec, step: Int): Column = {
    require(step >= 1, s"rolling step must be >= 1, got $step")
    (row_number().over(w) - 1) % step === 0
  }

  // --- the 12 registered stat ops (main.py:44-45) over any frame spec ---
  def rMean(c: Column, w: WindowSpec, mp: Int): Column = gated(c, w, mp)(avg)
  def rSum(c: Column, w: WindowSpec, mp: Int): Column = gated(c, w, mp)(sum)
  def rMin(c: Column, w: WindowSpec, mp: Int): Column = gated(c, w, mp)(min)
  def rMax(c: Column, w: WindowSpec, mp: Int): Column = gated(c, w, mp)(max)
  def rStd(c: Column, w: WindowSpec, mp: Int): Column = gated(c, w, mp)(stddev_samp)
  def rVar(c: Column, w: WindowSpec, mp: Int): Column = gated(c, w, mp)(var_samp)
  def rMedian(c: Column, w: WindowSpec, mp: Int): Column =
    gated(c, w, mp)(percentile(_, lit(0.5)))
  def rQuantile(c: Column, w: WindowSpec, mp: Int, q: Double): Column =
    gated(c, w, mp)(percentile(_, lit(q)))
  def rSem(c: Column, w: WindowSpec, mp: Int): Column =
    when(count(c).over(w) >= mp, stddev_samp(c).over(w) / sqrt(count(c).over(w)))
  def rSkew(c: Column, w: WindowSpec, mp: Int): Column = {
    val n = count(c).over(w).cast("double")
    when(n >= math.max(mp, 3), skewness(c).over(w) * sqrt(n * (n - 1)) / (n - 2))
  }
  def rKurt(c: Column, w: WindowSpec, mp: Int): Column = {
    val n = count(c).over(w).cast("double")
    when(n >= math.max(mp, 4),
      ((n + 1) * kurtosis(c).over(w) + lit(6.0)) * (n - 1) / ((n - 2) * (n - 3)))
  }
  def rCount(c: Column, w: WindowSpec): Column = count(c).over(w)

  /** pandas `Rolling.rank(method='average', pct=…)`: rank of the current
    * value within its own trailing window. No Spark builtin — evaluate
    * over the collected frame with array HOFs (stays in codegen; frame
    * arrays are window-sized, so memory is O(window) per row). */
  def rRank(c: Column, w: WindowSpec, mp: Int, pct: Boolean = false): Column = {
    val arr = collect_list(c).over(w) // nulls excluded by collect_list
    val less = size(filter(arr, x => x < c))
    val eq = size(filter(arr, x => x === c))
    val rk = less + (eq + 1) / 2.0
    val n = size(arr)
    val out = if (pct) rk / n else rk
    when(c.isNotNull && n >= mp, out)
  }

  /** pandas `Rolling.apply(func, raw=True)`: arbitrary Scala function over
    * the window contents as an array. */
  def rApply(c: Column, w: WindowSpec, mp: Int,
             f: Seq[Double] => Double): Column = {
    val fUdf = udf((xs: Seq[Double]) => f(xs))
    val arr = collect_list(c).over(w)
    when(count(c).over(w) >= mp, fUdf(arr))
  }

  /** pandas `Rolling.apply(func, raw=False)`: the callable receives the
    * window as a SERIES — (index, value) pairs in frame order — instead
    * of a bare value array (`parallel_window.py:187-192`; pandas hands a
    * `pd.Series` whose index is the original row labels). `idx` is the
    * frame's index column; null values are kept in the series (as NaN,
    * with their index) exactly like pandas, so the callable can reason
    * about positions — the gate still counts non-null values. */
  def rApplySeries(idx: Column, c: Column, w: WindowSpec, mp: Int,
                   f: Seq[(Long, Double)] => Double): Column = {
    val fUdf = udf((rows: Seq[org.apache.spark.sql.Row]) =>
      f(rows.map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1)))))
    // collect_list skips null STRUCTS but not structs with null fields,
    // so null values survive with their index
    val arr = collect_list(struct(idx.cast("long").as("i"),
      c.cast("double").as("v"))).over(w)
    when(count(c).over(w) >= mp, fUdf(arr))
  }

  /** Weighted window mean/sum (pandas `win_type=` rolling). Weights are
    * positional over the full window; pandas yields null until the window
    * is full. Uses lag-composition so everything stays declarative. */
  def weightedSum(c: Column, w: WindowSpec, weights: Seq[Double]): Column = {
    val n = weights.size
    val terms = weights.zipWithIndex.map { case (wt, i) =>
      lag(c, n - 1 - i).over(w) * lit(wt)
    }
    terms.reduce(_ + _) // any null in the frame -> null (pandas: NaN)
  }
  def weightedMean(c: Column, w: WindowSpec, weights: Seq[Double]): Column =
    weightedSum(c, w, weights) / lit(weights.sum)

  /** pandas weighted rolling variance (`win_type=` + `.var(ddof)`;
    * `roll_weighted_var`): with W = Σw, n = window size,
    *   var = Σw·(x-μ_w)² · n / ((n-ddof)·W)
    *       = (Σw·x² − (Σw·x)²/W) · n / ((n-ddof)·W).
    * Clamped at 0: the expanded form can dip to -ε where the
    * deviation-sum form is exactly 0. Null until the window is full,
    * like [[weightedSum]]. */
  def weightedVar(c: Column, w: WindowSpec, weights: Seq[Double],
                  ddof: Int = 1): Column = {
    val n = weights.size
    val sumW = weights.sum
    def lagged(i: Int): Column = lag(c, n - 1 - i).over(w)
    val s1 = weights.zipWithIndex.map { case (wt, i) => lagged(i) * lit(wt) }
      .reduce(_ + _)
    val s2 = weights.zipWithIndex.map { case (wt, i) =>
      val x = lagged(i); x * x * lit(wt)
    }.reduce(_ + _)
    // greatest() IGNORES nulls, so guard explicitly to keep the
    // null-until-full-window semantics
    when(s1.isNotNull,
      greatest((s2 - s1 * s1 / lit(sumW)) * n / lit((n - ddof) * sumW),
        lit(0.0)))
  }

  /** pandas weighted rolling std = sqrt of [[weightedVar]]. */
  def weightedStd(c: Column, w: WindowSpec, weights: Seq[Double],
                  ddof: Int = 1): Column =
    sqrt(weightedVar(c, w, weights, ddof))

  /** pandas `Rolling.cov(other, ddof=1)` between two columns. Spark's
    * `covar_samp` drops pairs where either side is null — exactly pandas'
    * pairwise masking; the gate counts complete pairs. */
  def rCov(a: Column, b: Column, w: WindowSpec, mp: Int): Column = {
    val pairs = count(when(a.isNotNull && b.isNotNull, 1)).over(w)
    when(pairs >= mp, covar_samp(a, b).over(w))
  }

  /** pandas `Rolling.corr(other)` between two columns (pearson).
    * Spark 4's builtin `corr` throws DIVIDE_BY_ZERO under ANSI mode on
    * a zero-variance frame (constant values after pairwise masking)
    * where pandas yields NaN — the windowed analogue of
    * [[graft.engine.Core.safeCorr]]: same co-moment ratio built from
    * covar_samp / stddev_samp window aggregates (all five share the
    * frame, ONE WindowExec pass), division guarded so degenerate
    * frames produce null. */
  def rCorr(a: Column, b: Column, w: WindowSpec, mp: Int): Column = {
    val aM = when(a.isNotNull && b.isNotNull, a)
    val bM = when(a.isNotNull && b.isNotNull, b)
    val pairs = count(aM).over(w)
    val sx = stddev_samp(aM).over(w)
    val sy = stddev_samp(bM).over(w)
    when(pairs >= mp && sx > 0 && sy > 0, covar_samp(a, b).over(w) / (sx * sy))
  }

  /** pandas `Rolling.agg(['mean','std',...])` / `.aggregate(spec)`: the
    * string-spec dispatch table over one frame, yielding `col_fn`-named
    * columns (reference: `parallel_window.py:194-197`, dict-spec pruning
    * `:106-118`). All exprs share the WindowSpec, so WindowExec evaluates
    * them in ONE pass over each frame — no per-op re-sort. */
  def rAggSpec(spec: Seq[(Column, String, Seq[String])], w: WindowSpec,
               mp: Int,
               custom: Map[String, (Column, WindowSpec, Int) => Column] =
                 Map.empty): Seq[Column] =
    for ((c, name, fns) <- spec; fn <- fns) yield {
      val e = fn match {
        case "mean" => rMean(c, w, mp)
        case "sum" => rSum(c, w, mp)
        case "min" => rMin(c, w, mp)
        case "max" => rMax(c, w, mp)
        case "std" => rStd(c, w, mp)
        case "var" => rVar(c, w, mp)
        case "median" => rMedian(c, w, mp)
        case "sem" => rSem(c, w, mp)
        case "skew" => rSkew(c, w, mp)
        case "kurt" => rKurt(c, w, mp)
        case "count" => rCount(c, w)
        // ROLL_AND_EXP_OPS completeness (main.py:44-45): quantile with
        // pandas' default q, rank with defaults; callables ('apply' and
        // parameterized quantile/rank) come in via `custom`
        case "quantile" => rQuantile(c, w, mp, 0.5)
        case "rank" => rRank(c, w, mp)
        case other => custom.get(other).map(_(c, w, mp)).getOrElse(
          throw new IllegalArgumentException(s"unknown agg '$other'"))
      }
      e.as(s"${name}_$fn")
    }

  /** Standard window weight generators (scipy.signal equivalents used by
    * pandas win_type; symmetric, matching scipy's `sym=True` default). */
  def triangWeights(n: Int): Seq[Double] =
    (1 to n).map { i =>
      if (n % 2 == 1) 1.0 - math.abs(i - (n + 1) / 2.0) * 2.0 / (n + 1)
      else if (i <= n / 2) (2.0 * i - 1) / n else (2.0 * (n - i) + 1) / n
    }
  def gaussianWeights(n: Int, std: Double): Seq[Double] =
    (0 until n).map { i =>
      val x = i - (n - 1) / 2.0
      math.exp(-0.5 * (x / std) * (x / std))
    }
  /** General cosine-sum family: hamming = (0.54, 0.46), hann = (0.5, 0.5),
    * blackman adds the second harmonic. */
  private def cosineSum(n: Int, a: Seq[Double]): Seq[Double] =
    if (n == 1) Seq(1.0) // scipy convention; avoids 0/0 at n=1
    else (0 until n).map { i =>
      val t = 2.0 * math.Pi * i / (n - 1)
      a.zipWithIndex.map { case (ak, k) =>
        (if (k % 2 == 0) 1 else -1) * ak * math.cos(k * t)
      }.sum
    }
  def hammingWeights(n: Int): Seq[Double] = cosineSum(n, Seq(0.54, 0.46))
  def hannWeights(n: Int): Seq[Double] = cosineSum(n, Seq(0.5, 0.5))
  def blackmanWeights(n: Int): Seq[Double] = cosineSum(n, Seq(0.42, 0.5, 0.08))
  def blackmanHarrisWeights(n: Int): Seq[Double] =
    cosineSum(n, Seq(0.35875, 0.48829, 0.14128, 0.01168))
  def nuttallWeights(n: Int): Seq[Double] =
    cosineSum(n, Seq(0.3635819, 0.4891775, 0.1365995, 0.0106411))
  def bartlettWeights(n: Int): Seq[Double] =
    if (n == 1) Seq(1.0) // avoids 0/0 at n=1
    else (0 until n).map { i =>
      val half = (n - 1) / 2.0
      1.0 - math.abs(i - half) / half
    }

  // Remaining scipy.signal window family (the reference's win_type=
  // accepts any of these — parallel_window.py:206-213); all symmetric
  // (`sym=True`), n=1-safe.
  def boxcarWeights(n: Int): Seq[Double] = Seq.fill(n)(1.0)
  def cosineWeights(n: Int): Seq[Double] =
    (0 until n).map(i => math.sin(math.Pi * (i + 0.5) / n))
  def barthannWeights(n: Int): Seq[Double] =
    if (n == 1) Seq(1.0)
    else (0 until n).map { i =>
      val f = i.toDouble / (n - 1) - 0.5
      0.62 - 0.48 * math.abs(f) + 0.38 * math.cos(2.0 * math.Pi * f)
    }
  def bohmanWeights(n: Int): Seq[Double] =
    if (n == 1) Seq(1.0)
    else (0 until n).map { i =>
      val x = math.abs(2.0 * i / (n - 1) - 1.0)
      (1.0 - x) * math.cos(math.Pi * x) + math.sin(math.Pi * x) / math.Pi
    }
  /** scipy parzen: note the n/2 (not (n-1)/2) denominators. */
  def parzenWeights(n: Int): Seq[Double] =
    (0 until n).map { i =>
      val x = math.abs(i - (n - 1) / 2.0)
      val h = n / 2.0
      if (x <= (n - 1) / 4.0)
        1.0 - 6.0 * math.pow(x / h, 2) + 6.0 * math.pow(x / h, 3)
      else 2.0 * math.pow(1.0 - x / h, 3)
    }
  /** scipy tukey(alpha): cosine tapers over the outer alpha fraction,
    * flat 1.0 middle; alpha=0 -> boxcar, alpha=1 -> hann. */
  def tukeyWeights(n: Int, alpha: Double): Seq[Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"tukey: need 0<=alpha<=1, got $alpha")
    if (n == 1 || alpha == 0.0) Seq.fill(n)(1.0)
    else (0 until n).map { i =>
      val edge = alpha * (n - 1) / 2.0
      val j = math.min(i, n - 1 - i).toDouble // symmetric position
      if (j >= edge) 1.0
      else 0.5 * (1.0 + math.cos(math.Pi * (2.0 * j / (alpha * (n - 1)) - 1.0)))
    }
  }
  /** Modified Bessel I0 by power series (converges fast for the beta
    * range kaiser uses; term ratio ~ (x/2k)², stop at 1e-16 rel). */
  private[engine] def besselI0(x: Double): Double = {
    var term = 1.0; var sum = 1.0; var k = 1
    val q = x * x / 4.0
    while (term > sum * 1e-16 && k < 1000) {
      term *= q / (k.toDouble * k); sum += term; k += 1
    }
    sum
  }
  def kaiserWeights(n: Int, beta: Double): Seq[Double] =
    if (n == 1) Seq(1.0)
    else {
      val denom = besselI0(beta)
      (0 until n).map { i =>
        val r = 2.0 * i / (n - 1) - 1.0
        besselI0(beta * math.sqrt(math.max(0.0, 1.0 - r * r))) / denom
      }
    }
  /** scipy exponential (sym: center fixed at (n-1)/2). */
  def exponentialWeights(n: Int, tau: Double): Seq[Double] = {
    require(tau > 0.0, s"exponential: need tau>0, got $tau")
    (0 until n).map(i => math.exp(-math.abs(i - (n - 1) / 2.0) / tau))
  }
}
