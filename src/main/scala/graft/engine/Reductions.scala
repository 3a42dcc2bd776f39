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
    * One hash aggregation + a broadcastable 1-row max. The (small)
    * counts table is materialized once — it feeds both the max branch
    * and the filter branch, which would otherwise each re-scan the
    * input. */
  def modeAll(df: DataFrame, c: String): DataFrame = {
    val counts = df.filter(col(c).isNotNull).groupBy(col(c)).count()
      .localCheckpoint()
    val maxCnt = counts.agg(max("count").as("__maxc"))
    counts.crossJoin(broadcast(maxCnt))
      .filter(col("count") === col("__maxc"))
      .select(col(c)).orderBy(col(c))
  }

  /** pandas `rank(method='average', na_option=…, ascending=…)` over one
    * column: min-rank + (ties-1)/2.
    *
    * SMALL-FRAME form: the partition-less window serializes into one
    * task. For whole-frame rank at scale use [[withRankAvg]] /
    * [[withRankStats]] (distributed stats-join, same semantics).
    *
    * na_option: 'keep' (default) leaves null ranks null and `pct`
    * divides by the non-null count; 'top'/'bottom' rank the null block
    * first/last as ONE tie group (nulls compare equal in the ordering,
    * so the same average-of-ties formula covers them) and `pct` divides
    * by the total row count — all matching pandas. */
  def rankAvg(c: Column, pct: Boolean = false,
              ascending: Boolean = true,
              naOption: String = "keep"): Column = {
    val ord = (ascending, naOption) match {
      case (true, "top")  => c.asc_nulls_first
      case (false, "top") => c.desc_nulls_first
      case (true, _)      => c.asc_nulls_last
      case (false, _)     => c.desc_nulls_last
    }
    val w = Window.orderBy(ord)
    val ties = count(lit(1)).over(Window.partitionBy(c))
    val r = rank().over(w) + (ties - 1) / 2.0
    naOption match {
      case "keep" =>
        val out = when(c.isNull, lit(null)).otherwise(r)
        if (pct) {
          val n = count(c).over(Window.partitionBy())
          when(c.isNull, lit(null)).otherwise(r / n)
        } else out
      case _ =>
        if (pct) r / count(lit(1)).over(Window.partitionBy()) else r
    }
  }

  /** Per-VALUE rank statistics table for column `c` — the shared prestep
    * of the distributed ungrouped rank family. Output columns (keyed by
    * `<p>v`, the distinct value):
    *   - `<p>_cnt`    tie-group size of the value
    *   - `<p>_before` count of values strictly before it (in `ascending`
    *                  order) — min rank = before+1, max = before+cnt,
    *                  average = before+(cnt+1)/2
    *   - `<p>_dense`  1-based dense rank of the value
    *
    * Shape: ONE probe job — the value-counts aggregate (map-side
    * combinable), sorted, with `limit(threshold+1)` bounding what can
    * reach the driver. Then:
    *   - counts ≤ `smallThreshold` (the common case: categorical /
    *     low-cardinality keys): prefix sums run on the driver over the
    *     bounded sorted counts and ship back as a broadcast
    *     LocalRelation for the join-back. Scale-safe — the frame itself
    *     never serializes, only its (bounded) distinct values do.
    *   - counts above threshold (near-unique doubles at 100 TB): the
    *     two-pass [[Cumulative.globalCumsumMulti]] range-partitioned
    *     prefix sum over the re-aggregated counts — every stage
    *     partitions, nothing driver-sized.
    * Ties never straddle partitions because the prefix sum runs
    * per-value. */
  def rankStatsTable(df: DataFrame, c: String, ascending: Boolean = true,
                     prefix: String = "__rk",
                     smallThreshold: Int = 1000000,
                     weight: Option[Column] = None): DataFrame = {
    val spark = df.sparkSession
    val key = s"${prefix}v"
    // `weight` lets pre-aggregated (value, multiplicity) inputs reuse
    // this path: the tie-group size is then sum(weight), not count(*).
    val cntAgg = weight.map(sum).getOrElse(count(lit(1)))
    val cnts = df.filter(col(c).isNotNull)
      .groupBy(col(c).as(key))
      .agg(cntAgg.cast("double").as(s"${prefix}_cnt"))
    val ord = if (ascending) col(key).asc else col(key).desc
    val sorted = cnts.orderBy(ord).limit(smallThreshold + 1).collect()
    if (sorted.length <= smallThreshold) {
      var before = 0.0
      val rows = new Array[org.apache.spark.sql.Row](sorted.length)
      var i = 0
      while (i < sorted.length) {
        val r = sorted(i)
        val cnt = r.getDouble(1)
        rows(i) = org.apache.spark.sql.Row(r.get(0), cnt, before, (i + 1).toDouble)
        before += cnt
        i += 1
      }
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val schema = StructType(Seq(
        cnts.schema.head, // key field keeps the original value type
        StructField(s"${prefix}_cnt", DoubleType),
        StructField(s"${prefix}_before", DoubleType),
        StructField(s"${prefix}_dense", DoubleType)))
      broadcast(spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema))
    } else {
      // Large path re-runs the counts aggregate (one extra map-side-
      // combinable pass) into the distributed prefix sum; checkpoint so
      // the two passes inside globalCumsumMulti share one evaluation.
      // Counts/dense indices ride as Double (rank callers cast back to
      // long): exact only below 2^53 rows / distinct values — fine for
      // row counts, not for 64-bit id-like payloads.
      val ck = cnts.localCheckpoint()
      Cumulative.globalCumsumMulti(ck.withColumn("__one", lit(1.0)),
          Seq(ord),
          Seq(col(s"${prefix}_cnt") -> s"${prefix}_cum",
              col("__one") -> s"${prefix}_dense"))
        .drop("__one")
        .withColumn(s"${prefix}_before",
          col(s"${prefix}_cum") - col(s"${prefix}_cnt"))
        .drop(s"${prefix}_cum")
    }
  }

  /** DISTRIBUTED global rank statistics — the 100 TB path for ungrouped
    * rank, replacing the `Window.orderBy()`-without-partitionBy form
    * (which serializes the whole frame into one task). Joins each row to
    * the [[rankStatsTable]] of its column on the value; null values
    * left-join to null stats; callers apply na_option. */
  def withRankStats(df: DataFrame, c: String, ascending: Boolean = true,
                    prefix: String = "__rk"): DataFrame = {
    val st = rankStatsTable(df, c, ascending, prefix)
    df.join(st, df(c) === col(s"${prefix}v"), "left").drop(s"${prefix}v")
  }

  /** pandas `rank(method='average', pct, na_option)` over the WHOLE
    * frame, scale-safe: adds the requested rank columns via
    * [[withRankStats]] + a broadcast 1-row total. `outs` is
    * (outputColumn, pct?) so average rank and its pct form share one
    * stats join. Semantics identical to [[rankAvg]]. */
  def withRankAvg(df: DataFrame, c: String, outs: Seq[(String, Boolean)],
                  ascending: Boolean = true,
                  naOption: String = "keep"): DataFrame = {
    val st0 = rankStatsTable(df, c, ascending)
    // the non-null count is the sum of the (tiny) per-value counts — no
    // second scan of the frame; only top/bottom need the all-rows count
    val nVal = st0.agg(coalesce(sum(col("__rk_cnt")), lit(0.0)).as("__n_val"))
    val tot = if (naOption == "keep") nVal
      else df.agg(count(lit(1)).cast("double").as("__n_all")).crossJoin(nVal)
    val st = df.join(st0, df(c) === col("__rkv"), "left").drop("__rkv")
      .crossJoin(broadcast(tot))
    val nNull = col("__n_all") - col("__n_val")
    val base = col("__rk_before") + (col("__rk_cnt") + 1) / 2.0
    val v = col(c)
    def rankExpr(pct: Boolean): Column = naOption match {
      case "keep" =>
        val r = when(v.isNull, lit(null)).otherwise(base)
        if (pct) r / col("__n_val") else r
      case "top" =>
        val r = when(v.isNull, (nNull + 1) / 2.0).otherwise(nNull + base)
        if (pct) r / col("__n_all") else r
      case "bottom" =>
        val r = when(v.isNull, col("__n_val") + (nNull + 1) / 2.0).otherwise(base)
        if (pct) r / col("__n_all") else r
      case other => throw new IllegalArgumentException(s"na_option: $other")
    }
    outs.foldLeft(st) { case (acc, (out, pct)) =>
      acc.withColumn(out, rankExpr(pct))
    }.drop("__rk_cnt", "__rk_before", "__rk_dense", "__n_all", "__n_val")
  }

  /** Exact global midrank (pandas `rank(method='average')`) of a NUMERIC
    * column, attached per row — the scale path for CONTINUOUS /
    * near-unique columns where a per-value stats table would be
    * frame-sized.
    *
    * Design: one light job fetches ~`buckets` approximate quantile cut
    * points; the bucket id is then a PURE FUNCTION OF THE VALUE
    * (indicator-sum over the cuts), so every plan branch that computes
    * it agrees by construction — no checkpoint, no sampled range
    * partitioning to keep aligned (a sampled `repartitionByRange`
    * evaluated in two branches picks different bounds and silently
    * mis-offsets ranks). The main job then:
    *   - per-bucket counts from a slim re-scan (map-side combinable) →
    *     running offsets via a window over the ~`buckets`-row table,
    *     broadcast back;
    *   - within-bucket cumulative + tie counts via windows partitioned
    *     by bucket (the default ordered-window RANGE frame spans the
    *     whole tie group; equal values share a bucket by construction);
    *   - midrank = offset + cum − tie + (tie+1)/2; null values → null.
    *
    * `statsSource`: when `df` is itself an expensive plan, pass the
    * underlying slim frame the cuts/offsets should be computed from (it
    * must contain the same `c` distribution). Ties all land in one
    * bucket, so a single dominant value skews its bucket — inherent to
    * exact tie-aware ranking; bucket counts otherwise balance to ~n/buckets.
    *
    * `width`: when > 0, the bucket-partitioned window's shuffle is
    * explicitly repartitioned to this many partitions (the caller sized
    * it from input volume via [[sortWidth]]) instead of inheriting the
    * session width — the window's ClusteredDistribution is satisfied by
    * the explicit hash exchange, so it is still ONE shuffle, just wide
    * enough that the per-task sort does not spill. Width only moves
    * work placement, never values. */
  def withMidrank(df: DataFrame, c: String, out: String, buckets: Int = 0,
                  statsSource: Option[DataFrame] = None,
                  knownCuts: Option[Array[Double]] = None,
                  width: Int = 0): DataFrame = {
    val src = statsSource.getOrElse(df).select(col(c))
    val n = if (buckets > 0) buckets
            else df.sparkSession.sparkContext.defaultParallelism
    // `knownCuts` lets callers batch several columns' cut points into
    // one aggregation job; cut quality only affects balance, not
    // correctness.
    val cuts = knownCuts.getOrElse(src.stat.approxQuantile(
      c, (1 until n).map(_.toDouble / n).toArray, 0.01)).distinct.sorted
    // native binary-search expression — O(log cuts)/row in codegen,
    // same value as the Σ(v > cut) indicator sum
    def bucketOf(v: Column): Column =
      coalesce(graft.functions.BucketBin.bucketBin(v, cuts), lit(0))
    val offs = {
      val partials = src.filter(col(c).isNotNull)
        .groupBy(bucketOf(col(c)).as("__bkt"))
        .agg(count(lit(1)).cast("double").as("__pn"))
      val wOff = Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      partials
        .withColumn("__off", coalesce(sum(col("__pn")).over(wOff), lit(0.0)))
        .select(col("__bkt"), col("__off"))
    }
    // Both frames share ONE window (same partitioning + ordering -> one
    // shuffle, one sort, one WindowExec): the default RANGE frame spans
    // up to and INCLUDING the current tie group; RANGE(0,0) is exactly
    // the tie group.
    val wCum = Window.partitionBy("__bkt").orderBy(col(c))
    val wTie = wCum.rangeBetween(Window.currentRow, Window.currentRow)
    val joined = df.withColumn("__bkt", bucketOf(col(c)))
      .join(broadcast(offs), Seq("__bkt"), "left")
    val placed =
      if (width > 0) joined.repartition(width, col("__bkt")) else joined
    placed
      .withColumn(out, when(col(c).isNotNull,
        col("__off") + count(col(c)).over(wCum).cast("double")
          - count(col(c)).over(wTie)
          + (count(col(c)).over(wTie) + 1) / 2.0))
      .drop("__bkt", "__off")
  }

  /** Midrank via the FIXED order-preserving bucket
    * ([[graft.functions.SortableBucket]], r15) with EXACT per-bucket
    * counts the caller already probed: a driver prefix sum turns the
    * counts into per-bucket offsets (LocalRelation, broadcast), the
    * frame attaches its bucket with one codegen bit-twiddle (no cut
    * array, no binary search) and one (bucket)-partitioned window adds
    * the within-bucket midrank. Unlike [[withMidrank]] there is NO
    * in-plan offsets subtree re-evaluating the source and NO quantile
    * probe — the caller's single probe pass feeds everything.
    * `bucketCounts` MUST be the exact (bucketOf(c) → count) histogram
    * of `df`'s non-null `c` (callers probe it with
    * [[boundedHistogram]] over the bucket expression); callers gate on
    * [[fixedBucketsBalanced]] first and fall back to [[withMidrank]]
    * when a single bucket would dominate the window. Values are exact
    * and identical to [[withMidrank]]'s on any input — bucket choice
    * moves placement, never ranks. */
  def withMidrankFixed(df: DataFrame, c: String, out: String,
                       bucketCounts: Seq[(Double, Long)],
                       width: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType,
      StructField, StructType}
    val spark = df.sparkSession
    val sorted = bucketCounts.sortBy(_._1)
    var before = 0.0
    val rows = sorted.map { case (b, cnt) =>
      val r = org.apache.spark.sql.Row(b.toInt, before)
      before += cnt; r
    }
    val offs = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("__fbk", IntegerType, nullable = false),
        StructField("__foff", DoubleType, nullable = false)))))
    val withBkt = df
      .withColumn("__fbkt",
        graft.functions.SortableBucket.sortableBucket(col(c)))
      .join(offs, col("__fbkt") === col("__fbk"), "left")
    val placed =
      if (width > 0) withBkt.repartition(width, col("__fbkt"))
      else withBkt
    val wCum = Window.partitionBy("__fbkt").orderBy(col(c))
    val wTie = wCum.rangeBetween(Window.currentRow, Window.currentRow)
    placed
      .withColumn(out, when(col(c).isNotNull,
        col("__foff") + count(col(c)).over(wCum).cast("double")
          - count(col(c)).over(wTie)
          + (count(col(c)).over(wTie) + 1) / 2.0))
      .drop("__fbkt", "__fbk", "__foff")
  }

  /** Balance gate for [[withMidrankFixed]]: fixed buckets are usable
    * when no single bucket holds more than `maxShare` of the rows (the
    * same 20% share bound the PlanGuard skew test enforces on
    * corpus-sized windows). A null histogram (probe overflowed: values
    * span > cap active buckets) also fails the gate. */
  def fixedBucketsBalanced(bucketCounts: Seq[(Double, Long)],
                           maxShare: Double = 0.2): Boolean =
    bucketCounts != null && {
      val total = bucketCounts.map(_._2).sum
      total == 0 || bucketCounts.map(_._2).max.toDouble / total <= maxShare
    }

  /** Volume-based shuffle width for a bucket-partitioned sort stage
    * (VERDICT r13 item 1). A `Window.partitionBy(bucket).orderBy(value)`
    * sorts each SHUFFLE PARTITION in one task sorter, so the session's
    * core-count width (right for task-overhead-bound jobs) makes every
    * sort partition `totalBytes / width` — measured to spill at 10×
    * scale (q_corr_matrix_full sf10: 13.7× of sf1 at width 32, 7.5× at
    * 256). This sizes the width so each task's in-flight sort stays
    * within `targetBytes` of execution memory: never below the session
    * width (small inputs keep today's plan), capped at 4096 (beyond
    * local scale; a real cluster re-tunes `targetBytes`). `fields` is
    * the sorted frame's column count; the per-row cost model is
    * 8 B/field + 32 B of UnsafeRow + sorter pointer/prefix overhead. */
  private[graft] def sortWidth(rows: Long, fields: Int, sessionWidth: Int,
      targetBytes: Long = 32L << 20): Int = {
    val rowBytes = 8L * fields + 32L
    val need = math.ceil(rows.toDouble * rowBytes / targetBytes).toLong
    math.max(sessionWidth.toLong, math.min(need, 4096L)).toInt
  }

  /** Plan-stats threshold above which the matrix rank prestep pays one
    * exact `count()` to size its own sort shuffle ([[sortWidth]]); the
    * pruned 4-column lineitem frame measures ~3.7 MB at sf0.1, ~38 MB
    * at sf1 (both healthy at session width) and ~380 MB at sf10 (the
    * measured spill decade), so 64 MB splits the decades cleanly. */
  private[graft] val SortBigBytes: Long = 64L << 20

  /** GROUPED analogue of [[withMidrank]]: per-group average midranks of
    * `c` without a `Window.partitionBy(key).orderBy(c)` — which puts a
    * whole group (~n/NDV(key) rows) on ONE task when the group key is
    * low-cardinality (`l_returnflag` has 3 values; at 100 TB that is a
    * third of the corpus through one sorter). Instead the value axis is
    * cut into ~`buckets` GLOBAL quantile buckets (shared across groups —
    * cut quality affects only balance, never correctness) and the
    * window partitions by (key, bucket):
    *   - per-(key,bucket) row counts → per-key running offsets, a
    *     window over the (NDV(key) × buckets)-row AGGREGATE — bounded;
    *   - one (key,bucket)-partitioned window gives within-bucket
    *     cumulative and tie counts (RANGE(0,0) = the tie group);
    *   - midrank = offset + cum − tie + (tie+1)/2, WITHIN the group.
    * NULL cells get a NULL midrank (never a numeric rank), so
    * downstream pairwise-complete correlation masks them like pandas —
    * the partitionBy(key).orderBy(c) form ranked nulls first.
    * `knownCuts` lets callers batch several columns' cut probes into
    * one aggregation job. */
  def withMidrankBy(df: DataFrame, key: String, c: String, out: String,
                    buckets: Int = 0,
                    knownCuts: Option[Array[Double]] = None,
                    statsSource: Option[DataFrame] = None): DataFrame = {
    val n = if (buckets > 0) buckets
            else df.sparkSession.sparkContext.defaultParallelism
    // `statsSource` (same contract as [[withMidrank]]): the per-(key,
    // bucket) counts only need (key, c) — pass the slim base frame when
    // `df` is itself an expensive plan (e.g. already joined to earlier
    // columns' rank stats), so the offsets aggregate never re-evaluates
    // those joins. Row multiplicity is identical by construction (rank
    // joins are 1:1 on (key, value)), so offsets are unchanged.
    val src = statsSource.getOrElse(df)
    val cuts = knownCuts.getOrElse(src.select(col(c)).stat.approxQuantile(
      c, (1 until n).map(_.toDouble / n).toArray, 0.01)).distinct.sorted
    def bucketOf(v: Column): Column =
      coalesce(graft.functions.BucketBin.bucketBin(v, cuts), lit(0))
    val offs = src.filter(col(c).isNotNull)
      .groupBy(col(key), bucketOf(col(c)).as("__bkt"))
      .agg(count(lit(1)).cast("double").as("__pn"))
      .withColumn("__off", coalesce(sum(col("__pn")).over(
        Window.partitionBy(col(key)).orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .select(col(key), col("__bkt"), col("__off"))
    val wCum = Window.partitionBy(col(key), col("__bkt")).orderBy(col(c))
    val wTie = wCum.rangeBetween(Window.currentRow, Window.currentRow)
    df.withColumn("__bkt", bucketOf(col(c)))
      .join(broadcast(offs), Seq(key, "__bkt"), "left")
      .withColumn(out, when(col(c).isNotNull,
        col("__off") + count(col(c)).over(wCum).cast("double")
          - count(col(c)).over(wTie)
          + (count(col(c)).over(wTie) + 1) / 2.0))
      .drop("__bkt", "__off")
  }

  /** Default counts-table cap for [[withGroupRankStats]]: the grouped
    * rank-stats frame has one row per (group, distinct value) and is
    * BROADCAST, so the per-column gate is NDV(key) × NDV(c) ≤ this
    * (≈1.5 MB of (key, value, cnt, before) doubles — same order as the
    * [[boundedHistogram]] cap the ungrouped matrix path uses). Callers
    * compare approx_count_distinct PRODUCTS against it (default ~5% rsd
    * per estimate), so the realized table can exceed the cap by the
    * combined estimation error — the cap is a sizing target with that
    * headroom, not a hard bound; the 160 B/row footprint model in
    * [[groupRankStatsMaxRows]] absorbs it. */
  private[graft] val GroupRankStatsMaxRows: Long = 65536L

  /** Session-adaptive form of the gate (VERDICT r14 item 6): size the
    * counts-table row cap from `spark.sql.autoBroadcastJoinThreshold`
    * so the broadcast stats table never outgrows what the session is
    * configured to broadcast. 160 B/row is a conservative
    * HashedRelation footprint for the 4-field row (boxed key +
    * UnsafeRow + hash-table entry), and intentionally maps the 10 MB
    * default threshold to exactly [[GroupRankStatsMaxRows]] (65536) so
    * default-config plans are unchanged. A disabled auto-broadcast
    * (threshold ≤ 0) falls back to the default cap: the join-back uses
    * an explicit broadcast() hint, which a -1 threshold does not
    * disable. */
  private[graft] def groupRankStatsMaxRows(
      spark: org.apache.spark.sql.SparkSession): Long = {
    val s = spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
      "10485760").trim
    // plain longs (incl. the -1 "disabled" sentinel) are not byte
    // strings; parse them directly
    val thr =
      try java.lang.Long.parseLong(s)
      catch { case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s) }
    if (thr <= 0) GroupRankStatsMaxRows else thr / 160L
  }

  /** GROUPED low-cardinality midrank: per-(key, value) counts — ONE
    * map-side-combinable aggregate whose exchange moves at most
    * NDV(key) × NDV(c) partial rows, NOT the frame — a per-key running
    * offset over that tiny table, and a BROADCAST join-back attaching
    * `rank = offset + (cnt + 1) / 2`. The frame itself is never
    * shuffled or sorted: this is the grouped twin of the ungrouped
    * matrix path's rank-stats join ([[rankStatsFromCounts]]), built
    * distributedly so no driver collect is needed. Midranks are EXACT
    * and identical to [[withMidrankBy]]'s (counts are exact; Spark
    * groups NaN with NaN and orders it greatest, same as the window
    * sort; -0.0/0.0 normalize in both); NULL cells get NULL (spec +
    * oracle pin equality). Callers gate on the counts-table size
    * ([[groupRankStatsMaxRows]]) — above it, fall back to the bucketed
    * window ([[withMidrankBy]]).
    * `statsSource`: slim (key, c) frame for the counts when `df` is an
    * expensive plan (same contract as [[withMidrank]]). CONTRACT: the
    * frame passed MUST be row-for-row equivalent to `df`'s (key, c)
    * projection — same multiset of (key, c) rows — or the counts (and
    * therefore every offset and rank) are silently wrong; the callers
    * here pass the exact slim base the ranked frame was built from
    * (rank joins are 1:1 on (key, value), so multiplicity is preserved
    * by construction). */
  def withGroupRankStats(df: DataFrame, key: String, c: String,
                         out: String,
                         statsSource: Option[DataFrame] = None): DataFrame = {
    val src = statsSource.getOrElse(df)
    val cnts = src.filter(col(c).isNotNull)
      .groupBy(col(key).as("__gk"), col(c).as("__gv"))
      .agg(count(lit(1)).cast("double").as("__gc"))
    // running offset within each key, over the aggregate only (bounded
    // by the caller's gate — never the frame)
    val wKey = Window.partitionBy(col("__gk")).orderBy(col("__gv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = cnts
      .withColumn("__gb", coalesce(sum(col("__gc")).over(wKey), lit(0.0)))
    df.join(broadcast(stats),
        col(key) === col("__gk") && col(c) === col("__gv"), "left")
      .withColumn(out, when(col(c).isNotNull,
        col("__gb") + (col("__gc") + 1) / 2.0))
      .drop("__gk", "__gv", "__gc", "__gb")
  }

  /** Within-tie ordinal — the 1-based position of each row inside its
    * value's tie group under `tiebreak` ordering (what pandas
    * `rank(method='first')` adds on top of the min rank) — WITHOUT a
    * `Window.partitionBy(value)` over the frame, which at scale puts a
    * whole tie group (~n/distinct rows) on one task when the column is
    * LOW-cardinality (exactly the case where ties matter).
    *
    * Design: the FIRST tiebreak column is cut into ~`buckets` quantile
    * buckets via the same value-deterministic binary-search expression
    * as [[withMidrank]] (bucket id is a pure function of the value, so
    * plan branches agree by construction, and bucket order == tiebreak
    * order because equal values always share a bucket). Then:
    *   - per-(value, bucket) counts (map-side combinable) → running
    *     offsets via a window over the (distinct × buckets)-row counts
    *     table, broadcast back;
    *   - `row_number` within a `(value, bucket)` window ordered by the
    *     full tiebreak — the largest partition any task holds is
    *     ~tieGroup/buckets, and `buckets` grows with the cluster.
    * Null values get a null ordinal (na_option='keep').
    *
    * Contract: intended for LOW-cardinality value columns (the counts
    * table is O(distinct × buckets) and is broadcast); for near-unique
    * columns tie groups are tiny and a plain per-value window is already
    * skew-free. The first tiebreak column must be numeric and ordered
    * ascending (it dominates the composite ordering). */
  def withinTieOrdinal(df: DataFrame, c: String, tiebreak: Seq[Column],
                       out: String, buckets: Int = 0,
                       statsSource: Option[DataFrame] = None,
                       knownCuts: Option[Array[Double]] = None): DataFrame = {
    val n = if (buckets > 0) buckets
            else df.sparkSession.sparkContext.defaultParallelism
    val tb = tiebreak.head
    // Both the cut probe and the (value, bucket) counts run on the SLIM
    // source frame (pass `statsSource` when `df` is itself an expensive
    // plan — e.g. already joined to its rank stats): they only need
    // (c, tiebreak.head), never the joined row. `knownCuts` (cut points
    // of the FIRST tiebreak column) lets callers batch the probe into
    // an existing stats job; cut quality affects balance only.
    val slim = statsSource.getOrElse(df)
    val cuts = knownCuts.getOrElse(
      slim.select(tb.cast("double").as("__tbv")).stat
        .approxQuantile("__tbv",
          (1 until n).map(_.toDouble / n).toArray, 0.01)).distinct.sorted
    def bucketOf(v: Column): Column =
      coalesce(graft.functions.BucketBin.bucketBin(v.cast("double"), cuts),
        lit(0))
    val withB = df.withColumn("__tb", bucketOf(tb))
    val cnts = slim.filter(col(c).isNotNull)
      .groupBy(col(c).as("__tv"), bucketOf(tb).as("__tbb"))
      .agg(count(lit(1)).as("__tn"))
    // running offset of each bucket within its value's tie group; the
    // window runs over the tiny counts table, never the frame
    val wOff = Window.partitionBy("__tv").orderBy("__tbb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts
      .withColumn("__toff", coalesce(sum(col("__tn")).over(wOff), lit(0L)))
      .select(col("__tv"), col("__tbb"), col("__toff"))
    val wIn = Window.partitionBy(col(c), col("__tb")).orderBy(tiebreak: _*)
    withB.join(broadcast(offs),
        withB(c) === col("__tv") && col("__tb") === col("__tbb"), "left")
      .withColumn(out,
        when(col(c).isNotNull, col("__toff") + row_number().over(wIn)))
      .drop("__tb", "__tv", "__tbb", "__toff")
  }

  /** Exact quantiles (pandas linear interpolation) via DISTRIBUTED SORT
    * instead of Catalyst's value-counting Percentile buffer. The buffer
    * is O(distinct values) per partial — unbounded for continuous
    * columns at scale; the sort is a range shuffle plus a lookup of the
    * two rows bracketing each quantile position. Eager (runs two jobs). */
  def quantilesBySort(df: DataFrame, c: String, qs: Seq[Double],
                      knownCount: Option[Long] = None): Seq[Double] = {
    // The sorted values are PERSISTED *before* zipWithIndex: its
    // partition-start-offsets job is the FIRST execution of the plan
    // and so populates the cache, and every later job (count, index
    // lookup) reads that same materialization. Persisting the zipped
    // RDD instead (ADVICE r10's first cut) left a race: the offsets
    // job ran on the UN-persisted parent, so a non-deterministic or
    // concurrently-changing upstream could cache data inconsistent
    // with the index assignment — silently wrong ranks with no guard
    // able to fire. Persisting the parent closes it with no extra pass.
    val vals = df.select(col(c).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .sort("v").rdd.map(_.getDouble(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sorted = vals.zipWithIndex()
      val n = knownCount.getOrElse(sorted.count())
      if (n == 0) return qs.map(_ => Double.NaN)
      val needed = qs.flatMap { q =>
        val p = (n - 1) * q
        Seq(math.floor(p).toLong, math.ceil(p).toLong)
      }.toSet
      val picked: Map[Long, Double] = sorted
        .filter { case (_, i) => needed.contains(i) }
        .map(_.swap).collect().toMap
      def at(idx: Long): Double = picked.getOrElse(idx,
        throw new IllegalStateException(
          s"quantilesBySort($c): sorted index $idx absent from the " +
            s"scan (n=$n, got ${picked.size}/${needed.size} positions) " +
            "— the input row count changed between jobs (knownCount " +
            "stale, or a non-deterministic source)"))
      qs.map { q =>
        val p = (n - 1) * q
        val lo = at(math.floor(p).toLong)
        val hi = at(math.ceil(p).toLong)
        lo + (p - math.floor(p)) * (hi - lo)
      }
    } finally vals.unpersist(blocking = false)
  }

  /** Bounded EXACT histogram aggregate: (value -> count) while the
    * distinct count stays ≤ `cap`; returns null the moment it would
    * exceed it. Mergeable (map-side combinable, one small map per
    * partial), state bounded by `cap` entries — so a single aggregation
    * pass answers "give me the exact value counts IF the column is
    * low-cardinality, else tell me it isn't", without a second scan and
    * without unbounded collect_list state. Overflow is flagged with a
    * null map key so merged partials stay poisoned. */
  def boundedHistAgg(cap: Int): Aggregator[java.lang.Double,
      java.util.HashMap[java.lang.Double, java.lang.Long],
      Map[Double, Long]] =
    new Aggregator[java.lang.Double,
        java.util.HashMap[java.lang.Double, java.lang.Long],
        Map[Double, Long]] {
      private def overflowed(
          b: java.util.HashMap[java.lang.Double, java.lang.Long]) =
        b.containsKey(null)
      private def poison(
          b: java.util.HashMap[java.lang.Double, java.lang.Long]) = {
        b.clear(); b.put(null, 0L); b
      }
      def zero = new java.util.HashMap[java.lang.Double, java.lang.Long]
      def reduce(b: java.util.HashMap[java.lang.Double, java.lang.Long],
                 a: java.lang.Double) = {
        if (a == null || a.isNaN || overflowed(b)) b
        else {
          val prev = b.get(a)
          if (prev != null) { b.put(a, prev + 1L); b }
          else if (b.size >= cap) poison(b)
          else { b.put(a, 1L); b }
        }
      }
      def merge(b1: java.util.HashMap[java.lang.Double, java.lang.Long],
                b2: java.util.HashMap[java.lang.Double, java.lang.Long]) = {
        if (overflowed(b1) || overflowed(b2)) poison(b1)
        else {
          val it = b2.entrySet().iterator()
          while (it.hasNext && !overflowed(b1)) {
            val e = it.next()
            val prev = b1.get(e.getKey)
            if (prev != null) b1.put(e.getKey, prev + e.getValue)
            else if (b1.size >= cap) poison(b1)
            else b1.put(e.getKey, e.getValue)
          }
          b1
        }
      }
      def finish(b: java.util.HashMap[java.lang.Double, java.lang.Long])
        : Map[Double, Long] =
        if (overflowed(b)) null
        else {
          val out = Map.newBuilder[Double, Long]
          val it = b.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            out += (e.getKey.doubleValue() -> e.getValue.longValue())
          }
          out.result()
        }
      def bufferEncoder: Encoder[java.util.HashMap[java.lang.Double, java.lang.Long]] =
        Encoders.kryo[java.util.HashMap[java.lang.Double, java.lang.Long]]
      def outputEncoder: Encoder[Map[Double, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Double, Long]]()
    }

  /** [[boundedHistAgg]] as a Column. */
  def boundedHistogram(c: Column, cap: Int = 65536): Column =
    udaf(boundedHistAgg(cap)).apply(c)

  /** Misra-Gries heavy-hitter summary: at most `k` (item -> estimated
    * count) entries from ONE mergeable aggregation pass — the
    * fail-soft sibling of [[boundedHistAgg]] (which poisons itself
    * above its cap). Classic guarantees, preserved under partial merge
    * (Agarwal et al., "Mergeable Summaries", PODS 2012): estimates
    * never exceed true counts, undercount by at most n/(k+1), and
    * every item with true frequency > n/(k+1) is present. reduce()
    * decrements all counters on overflow (amortized O(1)); merge()
    * adds the two maps then subtracts the (k+1)-th largest count from
    * all. With <= k distinct values the counts are EXACT — the regime
    * the oracle row pins; the error bound is spec-tested. State is k
    * entries per partial: "top domains over 100 TB" without shuffling
    * every distinct key. */
  /** One Misra-Gries reduce step over a mutable summary: increment a
    * present item, insert while under k, else decrement-all (dropping
    * zeros). Shared by [[misraGriesAgg]] and the streaming
    * [[graft.streaming.Streams.streamingHeavyHitters]] state handler so
    * the two surfaces cannot drift. Null items are ignored. */
  private[graft] def mgStep(b: java.util.HashMap[String, java.lang.Long],
                            a: String, k: Int): Unit = {
    if (a != null) {
      val prev = b.get(a)
      if (prev != null) b.put(a, prev + 1L)
      else if (b.size < k) b.put(a, 1L)
      else { // decrement-all: drop zeros, the new item is absorbed
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
  }

  def misraGriesAgg(k: Int): Aggregator[String,
      java.util.HashMap[String, java.lang.Long], Map[String, Long]] = {
    require(k >= 1, s"misraGriesAgg: need k >= 1; got $k (k <= 0 would " +
      "silently discard every item as an empty summary)")
    new Aggregator[String, java.util.HashMap[String, java.lang.Long],
        Map[String, Long]] {
      def zero = new java.util.HashMap[String, java.lang.Long]
      def reduce(b: java.util.HashMap[String, java.lang.Long],
                 a: String) = { mgStep(b, a, k); b }
      def merge(b1: java.util.HashMap[String, java.lang.Long],
                b2: java.util.HashMap[String, java.lang.Long]) = {
        val it = b2.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val prev = b1.get(e.getKey)
          b1.put(e.getKey,
            if (prev == null) e.getValue else prev + e.getValue)
        }
        if (b1.size > k) {
          // subtract the (k+1)-th largest count from every entry and
          // drop the non-positive ones: <= k survive, bounds add up
          val counts = new Array[Long](b1.size)
          var i = 0
          val vit = b1.values().iterator()
          while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
          java.util.Arrays.sort(counts)
          val sub = counts(counts.length - k - 1)
          val eit = b1.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            if (e.getValue <= sub) eit.remove()
            else e.setValue(e.getValue - sub)
          }
        }
        b1
      }
      def finish(b: java.util.HashMap[String, java.lang.Long])
        : Map[String, Long] = {
        val out = Map.newBuilder[String, Long]
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          out += (e.getKey -> e.getValue.longValue())
        }
        out.result()
      }
      def bufferEncoder: Encoder[java.util.HashMap[String, java.lang.Long]] =
        Encoders.kryo[java.util.HashMap[String, java.lang.Long]]
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }
  }

  /** [[misraGriesAgg]] exploded to a (item, est_count) frame, largest
    * first (count desc, then item — deterministic). Nulls don't count
    * (pandas value_counts dropna analogue). */
  def heavyHitters(df: DataFrame, c: String, k: Int): DataFrame =
    df.agg(udaf(misraGriesAgg(k)).apply(col(c).cast("string")).as("__mg"))
      .select(explode(col("__mg")).as(Seq("item", "est_count")))
      .orderBy(col("est_count").desc, col("item"))

  /** Rank-stats LocalRelation from DRIVER-SIDE value counts (the shared
    * finish of [[rankStatsTable]]'s small path and [[boundedHistogram]]
    * consumers): sorted values -> cnt/before/dense, broadcast for the
    * join-back. */
  def rankStatsFromCounts(spark: org.apache.spark.sql.SparkSession,
                          counts: Seq[(Double, Long)], prefix: String,
                          ascending: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    // merge -0.0 into 0.0 first: the histogram's boxed-Double keys
    // distinguish them, but Spark's join normalizes them EQUAL — two
    // stats rows for one join key would duplicate every 0.0-valued
    // frame row through the join-back (r15 hardening)
    val counts0 =
      if (counts.exists(t => t._1 == 0.0 &&
          (java.lang.Double.doubleToRawLongBits(t._1) != 0L)))
        counts.groupBy(t => if (t._1 == 0.0) 0.0 else t._1)
          .map { case (v, ts) => (v, ts.map(_._2).sum) }.toSeq
      else counts
    val sorted = if (ascending) counts0.sortBy(_._1) else counts0.sortBy(-_._1)
    var before = 0.0
    val rows = new Array[org.apache.spark.sql.Row](sorted.length)
    var i = 0
    while (i < sorted.length) {
      val (v, cnt) = sorted(i)
      rows(i) = org.apache.spark.sql.Row(v, cnt.toDouble, before, (i + 1).toDouble)
      before += cnt
      i += 1
    }
    val schema = StructType(Seq(
      StructField(s"${prefix}v", DoubleType),
      StructField(s"${prefix}_cnt", DoubleType),
      StructField(s"${prefix}_before", DoubleType),
      StructField(s"${prefix}_dense", DoubleType)))
    broadcast(spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema))
  }

  /** GROUPED analogue of [[rankStatsFromCounts]] (r15): driver-built
    * per-(key, value) midrank stats from per-key exact value
    * histograms plus per-key NaN counts, broadcast as a LocalRelation
    * with [[withGroupRankStats]]'s exact join-back columns
    * (`__gk` key, `__gv` value, `__gc` count, `__gb` before). Within
    * each key, before-counts accumulate in ascending value order with
    * NaN greatest (Spark's sort order; Spark's `===` matches NaN to
    * NaN, so the NaN stats row joins back) and -0.0 merges into 0.0
    * (Spark groups/joins them equal — two rows would duplicate
    * 0.0-valued frame rows through the join). Rank attachment is the
    * caller's `__gb + (__gc + 1) / 2`, identical to
    * [[withGroupRankStats]] — but with ZERO in-plan aggregate subtree:
    * the caller's single probe pass already paid for the counts. */
  def rankStatsFromGroupCounts(spark: org.apache.spark.sql.SparkSession,
      keyType: org.apache.spark.sql.types.DataType,
      perKey: Seq[(Any, Seq[(Double, Long)], Long)]): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val rows = perKey.flatMap { case (k, hist, nanCnt) =>
      val merged =
        if (hist.exists(t => t._1 == 0.0 &&
            java.lang.Double.doubleToRawLongBits(t._1) != 0L))
          hist.groupBy(t => if (t._1 == 0.0) 0.0 else t._1)
            .map { case (v, ts) => (v, ts.map(_._2).sum) }.toSeq
        else hist
      val sorted = merged.sortBy(_._1) // hist never holds NaN keys
      var before = 0.0
      val base = sorted.map { case (v, cnt) =>
        val r = org.apache.spark.sql.Row(k, v, cnt.toDouble, before)
        before += cnt; r
      }
      if (nanCnt > 0)
        base :+ org.apache.spark.sql.Row(k, Double.NaN, nanCnt.toDouble, before)
      else base
    }
    broadcast(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("__gk", keyType),
        StructField("__gv", DoubleType),
        StructField("__gc", DoubleType, nullable = false),
        StructField("__gb", DoubleType, nullable = false)))))
  }

  /** GROUPED analogue of [[withMidrankFixed]] (r15): per-group midrank
    * of `c` from the caller-probed exact per-(key, fixed-bucket)
    * counts — driver prefix sum per key → broadcast offsets → ONE
    * (key, bucket)-partitioned window. Replaces [[withMidrankBy]]'s
    * in-plan offsets aggregate (a full pass over the source) and its
    * quantile-cut probe. Values identical to [[withMidrankBy]]: NaN
    * buckets greatest (SortableBucket order = Spark sort order), null
    * cells rank to null, equal values never split buckets. */
  def withGroupMidrankFixed(df: DataFrame, key: String, c: String,
      out: String, perKey: Seq[(Any, Seq[(Double, Long)])],
      width: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType,
      StructField, StructType}
    val spark = df.sparkSession
    val rows = perKey.flatMap { case (k, bcnt) =>
      val sorted = bcnt.sortBy(_._1)
      var before = 0.0
      sorted.map { case (b, cnt) =>
        val r = org.apache.spark.sql.Row(k, b.toInt, before)
        before += cnt; r
      }
    }
    val offs = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("__fk", df.schema(key).dataType),
        StructField("__fbk", IntegerType, nullable = false),
        StructField("__foff", DoubleType, nullable = false)))))
    val withBkt = df
      .withColumn("__fbkt",
        graft.functions.SortableBucket.sortableBucket(col(c)))
      .join(offs, col(key) === col("__fk") &&
        col("__fbkt") === col("__fbk"), "left")
    val placed =
      if (width > 0) withBkt.repartition(width, col(key), col("__fbkt"))
      else withBkt
    val wCum = Window.partitionBy(col(key), col("__fbkt")).orderBy(col(c))
    val wTie = wCum.rangeBetween(Window.currentRow, Window.currentRow)
    placed
      .withColumn(out, when(col(c).isNotNull,
        col("__foff") + count(col(c)).over(wCum).cast("double")
          - count(col(c)).over(wTie)
          + (count(col(c)).over(wTie) + 1) / 2.0))
      .drop("__fbkt", "__fk", "__fbk", "__foff")
  }

  /** pandas' percentile row label: 0.25 -> "25%", 0.025 -> "2.5%".
    * `private[graft]` so label-addressed consumers (q_describe_approx's
    * band lookup) call THIS instead of re-stating the format — the
    * contract is single-sourced (ADVICE r13). */
  private[graft] def pctLabel(p: Double): String = {
    val v = math.round(p * 10000) / 100.0
    if (v == v.toInt) s"${v.toInt}%" else s"$v%"
  }

  /** Columns of `df` matching pandas-style dtype selectors for
    * `describe(include=/exclude=)`: "number", "object" (strings),
    * "datetime", "bool". */
  def selectDtypes(df: DataFrame, include: Seq[String],
                   exclude: Seq[String] = Nil): Seq[String] = {
    import org.apache.spark.sql.types._
    def matches(dt: DataType, sel: String): Boolean = sel match {
      case "number"   => dt.isInstanceOf[NumericType]
      case "object"   => dt == StringType
      case "datetime" =>
        dt == TimestampType || dt == TimestampNTZType || dt == DateType
      case "bool"     => dt == BooleanType
      case "all"      => true
      case other => throw new IllegalArgumentException(s"dtype selector: $other")
    }
    df.schema.fields
      .filter(f => include.isEmpty || include.exists(matches(f.dataType, _)))
      .filterNot(f => exclude.exists(matches(f.dataType, _)))
      .map(_.name).toSeq
  }

  /** pandas `describe(include=…, exclude=…, percentiles=…)` front-end:
    * selects columns by dtype and dispatches numeric vs object shape
    * (numeric wins when both kinds are selected, like pandas' default). */
  def describeAuto(df: DataFrame, include: Seq[String] = Seq("number"),
                   exclude: Seq[String] = Nil,
                   percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val cols = selectDtypes(df, include, exclude)
    require(cols.nonEmpty, s"describe: no columns match include=$include exclude=$exclude")
    val slim = df.select(cols.map(col): _*)
    val numeric = selectDtypes(slim, Seq("number"))
    val datetimes = selectDtypes(slim, Seq("datetime"))
    if (numeric.nonEmpty) describe(df, numeric, percentiles)
    else if (datetimes.size == cols.size)
      describeDatetime(df, datetimes, percentiles)
    else describeObject(df, cols)
  }

  /** pandas `describe()` on OBJECT (string) columns: count / unique /
    * top / freq. `top` is the lexicographically-smallest most-frequent
    * value — deterministic on ties, where pandas' "first encountered"
    * depends on row order. Assembled driver-side like [[describe]].
    *
    * ONE job for ANY column count: each row explodes to its (column,
    * value) pairs (a k-wide scan, not k scans), the per-(col, value)
    * counts hash-aggregate (map-side combinable), and a second tiny
    * aggregate over the counts table folds each column to
    * (count = Σ value counts, unique = #groups, top/freq = min_by over
    * the (-count, value) struct — max count, then smallest value). */
  def describeObject(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describe: at least one column required")
    val pairs = df.select(explode(map(
        cols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
        .as(Seq("__c", "__v")))
      .filter(col("__v").isNotNull)
    val perCol = pairs.groupBy(col("__c"), col("__v"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("__c"))
      .agg(sum(col("__n")).as("__count"),
        count(lit(1)).as("__unique"),
        min_by(col("__v"), struct((-col("__n")).as("nc"), col("__v"))).as("__top"),
        max(col("__n")).as("__freq"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    def cell(c: String): (Long, Long, String, Long) =
      perCol.getOrElse(c, (0L, 0L, null, 0L))
    val rows: Seq[(String, Seq[String])] = Seq(
      "count" -> cols.map(cell(_)._1.toString),
      "unique" -> cols.map(cell(_)._2.toString),
      "top" -> cols.map(cell(_)._3),
      "freq" -> cols.map(cell(_)._4.toString))
    val spark = df.sparkSession
    val data = rows.map { case (s, vs) =>
      org.apache.spark.sql.Row.fromSeq(s +: vs)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("stat",
        org.apache.spark.sql.types.StringType) +:
        cols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq, 1), schema)
  }

  /** pandas `describe()` on DATETIME columns (pandas ≥2 default /
    * `datetime_is_numeric=True` shape): count / mean / min / 25% / 50% /
    * 75% / max, timestamps rendered as strings (the stat column mixes
    * counts and timestamps, which pandas holds as object dtype). Same
    * job shape as numeric [[describe]] — one aggregate pass plus a
    * distributed quantile sort per column over epoch-micros.
    *
    * The mean is computed with EXACT integer arithmetic (decimal sum of
    * epoch micros, half-up integer division) — a double sum of ~1e19
    * carries ~0.3 µs of error, enough to flip the rounded microsecond
    * either side of a .5 boundary and flake any bit-exact comparison. */
  def describeDatetime(df: DataFrame, cols: Seq[String],
                       percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(cols.nonEmpty, "describe: at least one column required")
    val ps = percentiles.sorted
    // cast("timestamp") first: parquet TIMESTAMP can surface as NTZ,
    // which unix_micros rejects (identity under the UTC session tz)
    def usOf(c: String): Column = unix_micros(col(c).cast("timestamp"))
    val us = df.select(cols.map(c => usOf(c).cast("double").as(c)): _*)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"count__$c"),
        sum(usOf(c).cast("decimal(38,0)")).as(s"sum__$c"),
        min(usOf(c)).cast("double").as(s"min__$c"),
        max(usOf(c)).cast("double").as(s"max__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def cnt(c: String): Long = one.getLong(one.fieldIndex(s"count__$c"))
    def cell(name: String, c: String): Double = {
      val i = one.fieldIndex(s"${name}__$c")
      if (one.isNullAt(i)) Double.NaN else one.getDouble(i)
    }
    def meanUs(c: String): Option[BigInt] = {
      val i = one.fieldIndex(s"sum__$c")
      if (one.isNullAt(i) || cnt(c) == 0) None
      else {
        val s = BigInt(one.getDecimal(i).toBigInteger)
        val n = BigInt(cnt(c))
        Some((2 * s + n) / (2 * n)) // half-up for the positive epoch
      }
    }
    val quarts = cols.map(c =>
      c -> quantilesBySort(us, c, ps, knownCount = Some(cnt(c)))).toMap
    val fmtr = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    def fmtL(v: Long): String = java.time.LocalDateTime.ofInstant(
      java.time.Instant.EPOCH.plus(v, java.time.temporal.ChronoUnit.MICROS),
      java.time.ZoneOffset.UTC).format(fmtr)
    def fmt(v: Double): String = if (v.isNaN) null else fmtL(math.round(v))
    val rows: Seq[(String, Seq[String])] =
      Seq("count" -> cols.map(cnt(_).toString),
        "mean" -> cols.map(c => meanUs(c).map(m => fmtL(m.toLong)).orNull),
        "min" -> cols.map(c => fmt(cell("min", c)))) ++
      ps.zipWithIndex.map { case (p, i) =>
        pctLabel(p) -> cols.map(c => fmt(quarts(c)(i)))
      } ++
      Seq("max" -> cols.map(c => fmt(cell("max", c))))
    val spark = df.sparkSession
    val data = rows.map { case (s, vs) =>
      org.apache.spark.sql.Row.fromSeq(s +: vs)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("stat",
        org.apache.spark.sql.types.StringType) +:
        cols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq, 1), schema)
  }

  /** pandas `describe(percentiles=…)` -> (stat, col...) long-form frame.
    * One aggregate pass for count/mean/std/min/max plus
    * [[quantilesBySort]] per column for the exact percentile rows; the
    * result is assembled driver-side (describe is an eager, human-sized
    * summary — pandas' is too). */
  def describe(df: DataFrame, cols: Seq[String],
               percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(cols.nonEmpty, "describe: at least one column required")
    val ps = percentiles.sorted
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"count__$c"),
        avg(col(c)).as(s"mean__$c"),
        stddev_samp(col(c)).as(s"std__$c"),
        min(col(c)).cast("double").as(s"min__$c"),
        max(col(c)).cast("double").as(s"max__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def cell(name: String, c: String): Double = {
      val i = one.fieldIndex(s"${name}__$c")
      if (one.isNullAt(i)) Double.NaN else one.getDouble(i)
    }
    // one sort job per column; submit them CONCURRENTLY so wall time
    // is ~one sort instead of cols.size sequential sorts
    val quarts = Core.runConcurrently(cols)(c =>
      c -> quantilesBySort(df, c, ps,
        knownCount = Some(cell("count", c).toLong))).toMap
    val rows: Seq[(String, Seq[Double])] =
      Seq("count" -> cols.map(cell("count", _)),
        "mean" -> cols.map(cell("mean", _)),
        "std" -> cols.map(cell("std", _)),
        "min" -> cols.map(cell("min", _))) ++
      ps.zipWithIndex.map { case (p, i) =>
        pctLabel(p) -> cols.map(c => quarts(c)(i))
      } ++
      Seq("max" -> cols.map(cell("max", _)))
    val spark = df.sparkSession
    val data = rows.map { case (s, vs) =>
      org.apache.spark.sql.Row.fromSeq(s +: vs.map(v => if (v.isNaN) null else v))
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("stat",
        org.apache.spark.sql.types.StringType) +:
        cols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq, 1), schema)
  }

  /** 100 TB mode of [[describe]]: ONE aggregation job, no per-column
    * sort jobs — quartiles come from `approx_percentile` (t-digest-style
    * sketch with map-side partials, `accuracy` trades error for sketch
    * size) and everything else is the same exact single-pass aggregate.
    * Use when columns are wide or a full sort per column is off-budget;
    * the exact form stays the parity/oracle surface. */
  def describeApprox(df: DataFrame, cols: Seq[String],
                     accuracy: Int = 10000,
                     percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(cols.nonEmpty, "describe: at least one column required")
    val ps = percentiles.sorted
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).cast("double").as(s"count__$c"),
        avg(col(c)).as(s"mean__$c"),
        stddev_samp(col(c)).as(s"std__$c"),
        min(col(c)).cast("double").as(s"min__$c"),
        max(col(c)).cast("double").as(s"max__$c"),
        percentile_approx(col(c), array(ps.map(lit): _*),
          lit(accuracy)).as(s"q__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def cell(name: String, c: String): Double = {
      val i = one.fieldIndex(s"${name}__$c")
      if (one.isNullAt(i)) Double.NaN else one.getDouble(i)
    }
    def quart(c: String, qi: Int): Double = {
      val i = one.fieldIndex(s"q__$c")
      if (one.isNullAt(i)) Double.NaN
      else {
        val s = one.getSeq[Any](i)
        if (s == null || s(qi) == null) Double.NaN
        else s(qi).asInstanceOf[Number].doubleValue()
      }
    }
    val rows: Seq[(String, Seq[Double])] =
      Seq("count" -> cols.map(cell("count", _)),
        "mean" -> cols.map(cell("mean", _)),
        "std" -> cols.map(cell("std", _)),
        "min" -> cols.map(cell("min", _))) ++
      ps.zipWithIndex.map { case (p, i) =>
        pctLabel(p) -> cols.map(quart(_, i))
      } ++
      Seq("max" -> cols.map(cell("max", _)))
    val spark = df.sparkSession
    val data = rows.map { case (s, vs) =>
      org.apache.spark.sql.Row.fromSeq(s +: vs.map(v => if (v.isNaN) null else v))
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("stat",
        org.apache.spark.sql.types.StringType) +:
        cols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq, 1), schema)
  }

  /** Valid (non-null, non-NaN) row values as a sorted double array — the
    * shared prestep for the axis=1 quantile family. One `sort_array` over
    * a width-k array per row: O(k log k) work inside whole-stage codegen,
    * zero shuffle — the exact shape the reference's #1 benchmark
    * (`p_quantile(q, axis=1)`, `/root/reference/README.md:23-40`,
    * dispatch `parallel_dataframe.py:608`) needs at 100 TB: embarrassingly
    * parallel over rows. */
  def rowSortedValid(cols: Seq[Column]): Column =
    sort_array(filter(array(cols.map(_.cast("double")): _*),
      x => x.isNotNull && !isnan(x)))

  /** Row-wise quantile (pandas linear interpolation) over a PRE-SORTED
    * valid-value array ([[rowSortedValid]] — materialize it once via
    * `withColumn` when taking several quantiles). Interpolates between
    * the two bracketing order statistics; the high index is clamped so
    * frac=0 never reads past the end (ANSI mode throws on out-of-bounds
    * `element_at`). Empty row -> null (pandas NaN). */
  def rowQuantileSorted(arr: Column, q: Double): Column = {
    val n = size(arr)
    val pos = (n - 1).cast("double") * lit(q)
    val lo = floor(pos).cast("int")
    val frac = pos - floor(pos)
    val loV = element_at(arr, lo + 1)
    val hiV = element_at(arr, least(lo + 2, n))
    when(n > 0, loV + frac * (hiV - loV))
  }

  /** Row-wise (axis=1) quantile over a set of columns. */
  def rowQuantile(cols: Seq[Column], q: Double): Column =
    rowQuantileSorted(rowSortedValid(cols), q)

  /** Row-wise median = quantile(0.5). */
  def rowMedian(cols: Seq[Column]): Column = rowQuantile(cols, 0.5)

  /** Row-wise sample variance over the valid values (pandas
    * `var(axis=1, ddof)`): two-pass shifted-mean form
    * sum((x - mean)^2) / (n - ddof) — no catastrophic cancellation for
    * large-magnitude rows, unlike sum(x^2) - sum(x)^2/n. Null when
    * n <= ddof. Pure array HOFs — stays in codegen; the mean
    * sub-expression re-evaluates per element (HOF lambda semantics),
    * which is O(k^2) in the ROW width k — fine for axis=1 frames. */
  def rowVar(arr: Column, ddof: Int = 1): Column = {
    val n = size(arr).cast("double")
    val m = aggregate(arr, lit(0.0), (a, x) => a + x) / n
    val ss = aggregate(arr, lit(0.0), (a, x) => a + (x - m) * (x - m))
    when(n > ddof, ss / (n - ddof))
  }

  /** Row-wise sample std (pandas `std(axis=1)`). */
  def rowStd(arr: Column, ddof: Int = 1): Column = sqrt(rowVar(arr, ddof))

  /** pandas `DataFrame.agg(['sum','mean',...])` (whole-frame, axis=0;
    * reference `parallelize_aggregate`, `parallel_dataframe.py:341-361`):
    * list-spec over columns -> (stat, col...) long-form frame, exactly
    * the stat×col shape pandas concats. ONE single-pass aggregate (all
    * fn×col cells map-side combinable), assembled driver-side like
    * [[describe]]. */
  def aggregateSpec(df: DataFrame, cols: Seq[String],
                    fns: Seq[String]): DataFrame = {
    require(cols.nonEmpty && fns.nonEmpty, "aggregate: empty spec")
    val aggs = for (f <- fns; c <- cols)
      yield GroupOps.aggFn(f)(col(c)).cast("double").as(s"${f}__$c")
    val one = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rows = fns.map { f =>
      org.apache.spark.sql.Row.fromSeq(f +: cols.map { c =>
        val i = one.fieldIndex(s"${f}__$c")
        if (one.isNullAt(i)) null
        else { val v = one.getDouble(i); if (v.isNaN) null else (v: java.lang.Double) }
      })
    }
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val schema = StructType(StructField("stat", StringType) +:
      cols.map(c => StructField(c, DoubleType)))
    df.sparkSession.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** pandas `Series.value_counts(normalize, ascending, dropna)`:
    * (value, count, frac), ordered by count (desc by default) with the
    * VALUE as the deterministic tie-break (pandas' first-encountered
    * tie order is row-order-dependent — meaningless distributed). One
    * hash aggregate + a broadcast 1-row total. */
  def valueCounts(df: DataFrame, c: String, ascending: Boolean = false,
                  dropna: Boolean = true): DataFrame = {
    val base = if (dropna) df.filter(col(c).isNotNull) else df
    val counts = base.groupBy(col(c)).agg(count(lit(1)).as("count"))
    val tot = counts.agg(sum(col("count")).cast("double").as("__t"))
    val ord = if (ascending) col("count").asc else col("count").desc
    counts.crossJoin(broadcast(tot))
      .select(col(c), col("count"), (col("count") / col("__t")).as("frac"))
      .orderBy(ord, col(c))
  }

  /** 100 TB mode of nunique: HyperLogLog++ sketch (`approx_count_distinct`,
    * `rsd` = relative standard deviation) — one pass, mergeable partials,
    * constant memory; the exact `count_distinct` stays the parity surface. */
  def nuniqueApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.01): DataFrame =
    df.agg(approx_count_distinct(col(cols.head), rsd).as(cols.head),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(c)): _*)

  /** pandas `quantile(q, interpolation=)` beyond 'linear': lower /
    * higher / nearest / midpoint, exactly. Position p = q·(n−1); the
    * non-linear modes are order statistics at ⌊p⌋/⌈p⌉, fetched with the
    * same exact `percentile` at integer-position fractions (linear
    * interpolation at an integer position IS the element). 'nearest'
    * uses numpy's banker's rounding at frac = .5 (even index wins),
    * matching pandas. One count job + one aggregate for ALL requested
    * qs and modes; non-null count per column, like pandas. Returns one
    * row per q: (q, linear, lower, higher, nearest, midpoint). */
  def quantileInterp(df: DataFrame, c: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantile: need 0<=q<=1, got $qs")
    val spark = df.sparkSession
    val x = col(c).cast("double")
    val n = df.filter(x.isNotNull && !isnan(x)).count()
    require(n > 0, s"quantile: no non-null values in $c")
    def at(pos: Long): Column =
      if (n == 1) percentile(x, lit(0.0))
      else percentile(x, lit(pos.toDouble / (n - 1)))
    val aggs = qs.zipWithIndex.flatMap { case (q, i) =>
      val p = q * (n - 1)
      val lo = math.floor(p).toLong
      val hi = math.ceil(p).toLong
      val frac = p - lo
      val near =
        if (frac > 0.5) hi
        else if (frac < 0.5) lo
        else if (lo % 2 == 0) lo else hi // numpy banker's rounding
      Seq(percentile(x, lit(q)).as(s"__lin$i"), at(lo).as(s"__lo$i"),
        at(hi).as(s"__hi$i"), at(near).as(s"__nr$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("q", DoubleType),
      StructField("linear", DoubleType), StructField("lower", DoubleType),
      StructField("higher", DoubleType), StructField("nearest", DoubleType),
      StructField("midpoint", DoubleType)))
    val rows = qs.zipWithIndex.map { case (q, i) =>
      val lo = one.getDouble(4 * i + 1); val hi = one.getDouble(4 * i + 2)
      org.apache.spark.sql.Row(q, one.getDouble(4 * i), lo, hi,
        one.getDouble(4 * i + 3), (lo + hi) / 2.0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
