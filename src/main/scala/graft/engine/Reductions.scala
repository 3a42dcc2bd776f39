package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Full-frame reductions and per-column statistics.
  *
  * Reproduces the reference's reduction surface (`p_min/max/mean/median/
  * skew/kurt/std/var/sem/sum/prod/mad/nunique/idxmax/idxmin/mode/quantile/
  * rank/describe`, `/root/reference/parallel_pandas/core/
  * parallel_dataframe.py:714-861, 432-647`) with Spark-native aggregates.
  *
  * Numeric-semantics notes (SURVEY.md §2.2):
  *   - pandas `skew`/`kurt` are bias-adjusted sample moments (G1, G2);
  *     Spark `skewness`/`kurtosis` are population moments (g1, g2). The
  *     adjusted forms below match pandas and DuckDB exactly.
  *   - `std`/`var` default ddof=1 == Spark `stddev_samp`/`var_samp`.
  *   - quantile: pandas default linear interpolation == Catalyst
  *     `percentile` (exact) == DuckDB `quantile_cont`.
  *
  * All aggregates here are single-pass map-side-combinable Catalyst
  * expressions — at 100 TB they run as partial aggregation with no extra
  * shuffle beyond the final 1-row combine.
  */
object Reductions {

  /** Bias-adjusted sample skewness G1 = g1 * sqrt(n(n-1)) / (n-2). */
  def sampleSkew(c: Column): Column = {
    val n = count(c).cast("double")
    when(n >= 3, skewness(c) * sqrt(n * (n - 1)) / (n - 2))
  }

  /** Bias-adjusted excess sample kurtosis
    * G2 = ((n+1) g2 + 6) (n-1) / ((n-2)(n-3)), g2 = Spark `kurtosis`. */
  def sampleKurt(c: Column): Column = {
    val n = count(c).cast("double")
    when(n >= 4, ((n + 1) * kurtosis(c) + lit(6.0)) * (n - 1) / ((n - 2) * (n - 3)))
  }

  /** Standard error of the mean (ddof=1): stddev_samp / sqrt(n). */
  def sem(c: Column): Column = stddev_samp(c) / sqrt(count(c).cast("double"))

  /** Sample variance with arbitrary ddof (pandas `var(ddof=k)`). */
  def varDdof(c: Column, ddof: Int): Column = {
    val n = count(c).cast("double")
    when(n > ddof, var_pop(c) * n / (n - ddof))
  }

  /** `sum` with pandas `min_count` gate: null unless >= minCount non-null. */
  def sumMinCount(c: Column, minCount: Int): Column =
    when(count(c) >= minCount, sum(c))

  /** Exact product aggregate (pandas `prod`). Null-skipping; empty input
    * -> 1.0 (pandas identity). Mergeable, so it runs as a normal partial
    * aggregate at scale. */
  val productAgg: Aggregator[java.lang.Double, Double, Double] =
    new Aggregator[java.lang.Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: java.lang.Double): Double =
        if (a == null || a.isNaN) b else b * a.doubleValue()
      def merge(b1: Double, b2: Double): Double = b1 * b2
      def finish(r: Double): Double = r
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Product as a Column (registered UDAF under the hood). */
  def product(c: Column): Column = udaf(productAgg).apply(c)

  /** Mean absolute deviation about the mean (removed from pandas 2.x but
    * still in the reference surface). Two-pass: per-column means are tiny
    * (1 row) -> broadcast cross join, never a wide shuffle. */
  def mad(df: DataFrame, cols: Seq[String]): DataFrame = {
    val means = df.agg(
      avg(col(cols.head)).as(s"__m_${cols.head}"),
      cols.tail.map(c => avg(col(c)).as(s"__m_$c")): _*)
    val joined = df.crossJoin(broadcast(means))
    joined.agg(
      avg(abs(col(cols.head) - col(s"__m_${cols.head}"))).as(s"mad_${cols.head}"),
      cols.tail.map(c => avg(abs(col(c) - col(s"__m_$c"))).as(s"mad_$c")): _*)
  }

  /** idx label of the per-column max/min, first occurrence on ties
    * (pandas `idxmax`/`idxmin`): max_by over (value, -idx) struct. */
  def idxmax(idx: Column, value: Column): Column =
    max_by(idx, struct(value, (idx * -1).as("_negidx")))
  def idxmin(idx: Column, value: Column): Column =
    min_by(idx, struct(value, idx))

  /** All tied modes of a column, like pandas `mode` (multi-row, sorted).
    * One hash aggregation + a broadcastable 1-row max. */
  def modeAll(df: DataFrame, c: String): DataFrame = {
    val counts = df.filter(col(c).isNotNull).groupBy(col(c)).count()
    val w = Window.orderBy(col("count").desc)
    // max over a 1-row agg instead of a global window: no single-partition sort
    val maxCnt = counts.agg(max("count").as("__maxc"))
    counts.crossJoin(broadcast(maxCnt))
      .filter(col("count") === col("__maxc"))
      .select(col(c)).orderBy(col(c))
  }

  /** pandas `rank(method='average', na_option='keep', ascending=…)` over
    * one column: min-rank + (ties-1)/2. Null values get null rank. `pct`
    * divides by the non-null count. */
  def rankAvg(c: Column, pct: Boolean = false,
              ascending: Boolean = true): Column = {
    val w = Window.orderBy(if (ascending) c.asc_nulls_last else c.desc_nulls_last)
    val ties = count(c).over(Window.partitionBy(c))
    val r = rank().over(w) + (ties - 1) / 2.0
    val out = when(c.isNull, lit(null)).otherwise(r)
    if (pct) {
      val n = count(c).over(Window.partitionBy())
      when(c.isNull, lit(null)).otherwise(r / n)
    } else out
  }

  /** pandas `describe()` -> (stat, col...) long-form frame: one aggregate
    * pass computing all stats, then an 8-row driver-side unpivot.
    * The three quartiles share ONE Percentile buffer per column
    * (`percentile(c, array(...))`) — a per-row value-counting aggregate,
    * so one buffer instead of three cuts the dominant cost 3x. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"count__$c"),
        avg(col(c)).as(s"mean__$c"),
        stddev_samp(col(c)).as(s"std__$c"),
        min(col(c)).cast("double").as(s"min__$c"),
        percentile(col(c), array(lit(0.25), lit(0.5), lit(0.75))).as(s"q__$c"),
        max(col(c)).cast("double").as(s"max__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stats = Seq("count", "mean", "std", "min", "25%", "50%", "75%", "max")
    def cell(s: String, c: String): String = s match {
      case "25%" => s"`q__$c`[0]"
      case "50%" => s"`q__$c`[1]"
      case "75%" => s"`q__$c`[2]"
      case _     => s"`${s}__$c`"
    }
    // unpivot: stack the single row into (stat, c1..cn)
    val stackExpr = stats.map { s =>
      (Seq(s"'$s'") ++ cols.map(c => cell(s, c))).mkString(", ")
    }.mkString(s"stack(${stats.size}, ", ", ", ")") +
      (Seq("stat") ++ cols).mkString(" as (", ", ", ")")
    one.select(expr(stackExpr))
  }
}
