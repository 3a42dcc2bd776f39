package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** pandas frame-alignment / selection ops the reference proxies
  * wholesale and no other module covers: shift/diff, nlargest /
  * nsmallest, corrwith, groupby.filter, combine_first, concat
  * (axis=0, join='outer'), Series.explode, get_dummies, and the
  * row-wise (axis=1) rank / idx-extrema pair.
  *
  * Scale shapes: shift/diff are one window shuffle on the explicit
  * order; nlargest/nsmallest compile to TakeOrderedAndProject (each
  * task keeps n rows, the driver merges n·partitions — never a full
  * sort); corrwith is ONE equi-join + ONE aggregate for all pairs;
  * groupFilter aggregates to a |groups|-row table that AQE broadcasts
  * back; combine_first is a single full-outer join; concatOuter and
  * the row-wise family are zero-shuffle; get_dummies does the same
  * bounded distinct-collect schema discovery as crosstab. */
object Frame {

  /** pandas shift(periods): value `periods` rows back (negative =
    * forward) under the explicit order; null beyond the edge. */
  def shift(c: Column, periods: Int, w: WindowSpec): Column =
    if (periods >= 0) lag(c, periods).over(w) else lead(c, -periods).over(w)

  /** pandas diff(periods): c - shift(c, periods). */
  def diff(c: Column, periods: Int, w: WindowSpec): Column =
    c - shift(c, periods, w)

  /** pandas `cumsum(axis=1)` / `cummax(axis=1)`: running accumulation
    * ACROSS columns per row — zero shuffle, plain codegen expressions
    * (no HOFs). pandas null semantics: a null cell stays null in the
    * output but the accumulation skips it (skipna=True). Returns the k
    * accumulated columns named `<c>_<op>`. */
  def rowCumsum(cols: Seq[Column], names: Seq[String]): Seq[Column] =
    names.indices.map { i =>
      val acc = cols.take(i + 1)
        .map(c => coalesce(c, lit(0.0)))
        .reduce(_ + _)
      when(cols(i).isNotNull, acc).as(s"${names(i)}_cumsum")
    }

  def rowCummax(cols: Seq[Column], names: Seq[String]): Seq[Column] =
    names.indices.map { i =>
      val prefix = cols.take(i + 1)
      val mx = if (prefix.size == 1) prefix.head else greatest(prefix: _*)
      when(cols(i).isNotNull, mx).as(s"${names(i)}_cummax")
    }

  /** pandas `Series.autocorr(lag)`: Pearson correlation of the series
    * with its own lag, per group — the window lag is the only shuffle
    * (on the group key) and the corr aggregate combines map-side.
    * Pairs where either side is null drop out of `corr` exactly like
    * pandas' pairwise masking (the first `lag` rows per group). */
  def autocorr(df: DataFrame, c: String, w: WindowSpec,
               keys: Seq[String], lags: Seq[Int] = Seq(1)): DataFrame = {
    val lagged = lags.foldLeft(df) { (d, l) =>
      d.withColumn(s"__lag_$l", shift(col(c), l, w))
    }
    lagged.groupBy(keys.map(col): _*)
      .agg(Core.safeCorr(col(c), col(s"__lag_${lags.head}")).as(s"autocorr_${lags.head}"),
        lags.tail.map(l =>
          Core.safeCorr(col(c), col(s"__lag_$l")).as(s"autocorr_$l")): _*)
  }

  /** pandas nlargest(n, column): top n by `c` descending. The
    * `tiebreak` column makes the cut deterministic (pandas keep='first'
    * relies on input order; a distributed frame has none). Plans as
    * TakeOrderedAndProject: per-task top-n, driver merge — no global
    * sort at any scale. */
  def nlargest(df: DataFrame, n: Int, c: String, tiebreak: String): DataFrame =
    df.orderBy(col(c).desc, col(tiebreak)).limit(n)

  /** pandas nsmallest(n, column) — see [[nlargest]]. */
  def nsmallest(df: DataFrame, n: Int, c: String, tiebreak: String): DataFrame =
    df.orderBy(col(c).asc, col(tiebreak)).limit(n)

  /** pandas corrwith(other): Pearson correlation per aligned column
    * pair, rows (column, corr) — the Series pandas returns. pandas
    * aligns on the index; here the join key is explicit. ONE inner
    * equi-join then ONE aggregate computes every pair (no per-pair
    * jobs); nulls are pairwise-skipped by `corr` exactly as pandas
    * skips NaNs. */
  def corrwith(left: DataFrame, right: DataFrame, on: Seq[String],
               pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "corrwith: need at least one column pair")
    val j = left.join(right, on, "inner")
    val aggs = pairs.map { case (a, b) => Core.safeCorr(col(a), col(b)).as(s"$a") }
    val one = j.agg(aggs.head, aggs.tail: _*)
    val stack = pairs.map { case (a, _) => s"'$a', `$a`" }.mkString(", ")
    one.select(expr(s"stack(${pairs.size}, $stack) AS (colname, corr)")
      .as(Seq("colname", "corr")))
  }

  /** pandas groupby(keys).filter(pred): keep the rows of every group
    * whose aggregate satisfies the predicate. The group table is
    * |groups| rows (partial-aggregated map-side), so AQE broadcasts
    * the LEFT SEMI join back — the frame itself is never shuffled
    * when the group count is small. */
  def groupFilter(df: DataFrame, keys: Seq[String], agg: Column,
                  pred: Column => Column): DataFrame = {
    val g = df.groupBy(keys.map(col): _*).agg(agg.as("__a"))
      .filter(pred(col("__a"))).select(keys.map(col): _*)
    df.join(g, keys, "left_semi")
  }

  /** pandas combine_first(right): left's nulls filled from right,
    * aligned on `on`; right-only rows appended, left-only and
    * right-only columns pass through. ONE full-outer join; the
    * using-column join form coalesces the keys. */
  def combineFirst(left: DataFrame, right: DataFrame,
                   on: Seq[String]): DataFrame = {
    val shared = left.columns.filterNot(on.contains)
      .filter(right.columns.contains).toSeq
    val leftOnly = left.columns.filterNot(on.contains)
      .filterNot(right.columns.contains).toSeq
    val rightOnly = right.columns.filterNot(on.contains)
      .filterNot(left.columns.contains).toSeq
    val rr = shared.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"__r_$c"))
    left.join(rr, on, "full_outer")
      .select(on.map(col) ++
        shared.map(c => coalesce(col(c), col(s"__r_$c")).as(c)) ++
        leftOnly.map(col) ++ rightOnly.map(col): _*)
  }

  /** pandas concat(axis=0, join='outer'): stack frames, null-filling
    * columns absent from a side — unionByName(allowMissingColumns),
    * zero shuffle. */
  def concatOuter(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "concat: need at least one frame")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** pandas Series.explode: one output row per array element; null or
    * empty arrays keep one row with a null value (explode_outer) —
    * pandas emits NaN for those. A Generate over the scan, zero
    * shuffle. */
  def explodeCol(df: DataFrame, c: String, out: String): DataFrame =
    df.withColumn(out, explode_outer(col(c))).drop(c)

  /** pandas get_dummies: one 0/1 column per observed category of `c`
    * (sorted), named `prefix_<value>`. The column set is a bounded
    * distinct collect — the same data-dependent schema discovery
    * pandas does (and [[Reshape.crosstab]] uses); the dummies
    * themselves are pure codegen, zero shuffle. */
  def getDummies(df: DataFrame, c: String, prefix: String,
                 maxCategories: Int = 10000): DataFrame = {
    val vals = df.select(col(c).cast("string")).distinct()
      .limit(maxCategories + 1).collect().map(_.getString(0))
      .filter(_ != null).sorted
    require(vals.length <= maxCategories,
      s"get_dummies: > $maxCategories categories in '$c'")
    df.select(df.columns.map(col) ++ vals.map(v =>
      when(col(c).cast("string") === v, 1).otherwise(0)
        .as(s"${prefix}_$v")): _*)
  }

  /** pandas rank(axis=1, method='average') for one cell: the rank of
    * column `c` among `cols` within its own row — #smaller +
    * (#equal+1)/2 (the equal count includes the cell itself). Array
    * HOFs over a row-local array: pure codegen, zero shuffle. Nulls
    * in the ranked columns are not supported (pandas skips them;
    * callers filter or fill first). */
  def rowRank(cols: Seq[String], c: String): Column = {
    val arr = array(cols.map(x => col(x).cast("double")): _*)
    val v = col(c).cast("double")
    size(filter(arr, x => x < v)) +
      (size(filter(arr, x => x === v)) + lit(1)) / 2.0
  }

  /** pandas idxmax(axis=1): name of the first column (in given order)
    * holding the row maximum. */
  def idxmaxRow(cols: Seq[String]): Column = {
    val arr = array(cols.map(x => col(x).cast("double")): _*)
    element_at(array(cols.map(lit): _*),
      array_position(arr, array_max(arr)).cast("int"))
  }

  /** pandas idxmin(axis=1) — first column holding the row minimum. */
  def idxminRow(cols: Seq[String]): Column = {
    val arr = array(cols.map(x => col(x).cast("double")): _*)
    element_at(array(cols.map(lit): _*),
      array_position(arr, array_min(arr)).cast("int"))
  }

  // ---- round-6 batch: clip / where / mask, factorize, stack /
  //      unstack, time-of-day selection, searchsorted ----

  /** pandas clip(lower, upper): values outside the bounds snap to the
    * bound; nulls pass through. Spark's greatest/least SKIP nulls (a
    * null input would snap to the bound), so the null case is guarded
    * explicitly. Pure codegen, zero shuffle. */
  def clip(c: Column, lower: Option[Double], upper: Option[Double]): Column = {
    val lo = lower.map(v => greatest(c, lit(v))).getOrElse(c)
    val hi = upper.map(v => least(lo, lit(v))).getOrElse(lo)
    when(c.isNull, lit(null)).otherwise(hi)
  }

  /** pandas where(cond, other): KEEP where cond holds, else `other`
    * (pandas default other=NaN -> pass lit(null)). */
  def where(c: Column, cond: Column, other: Column): Column =
    when(cond, c).otherwise(other)

  /** pandas mask(cond, other): REPLACE where cond holds — the inverse
    * of [[where]]. */
  def mask(c: Column, cond: Column, other: Column): Column =
    when(cond, other).otherwise(c)

  /** pandas factorize(): integer codes 0..k-1 in order of FIRST
    * APPEARANCE under the explicit row order `ordCol`; null -> -1
    * (pandas assigns NaN code -1 and excludes it from the uniques).
    *
    * Scale shape: one hash aggregate to |distinct| rows (min(ord) per
    * value), then codes are assigned WITHOUT a partition-less window —
    * a range repartition on first-appearance keeps global order across
    * partitions and `zipWithIndex` numbers rows distributively (its
    * only cost is one small per-partition count job). Factorizing an
    * ID-like column (k ~ n) therefore never funnels through one task.
    * The join back is AQE-broadcast when k is small; the frame itself
    * is never globally sorted. */
  def factorize(df: DataFrame, c: String, ordCol: String,
                out: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val firsts = df.filter(col(c).isNotNull)
      .groupBy(col(c)).agg(min(col(ordCol)).as("__first"))
    // equal __first keys land in one range partition, so the secondary
    // sort on the value column makes tie order deterministic too
    val sorted = firsts.repartitionByRange(col("__first"), col(c))
      .sortWithinPartitions("__first", c)
    val schema = StructType(sorted.schema.fields :+
      StructField(out, LongType, nullable = false))
    val codes = df.sparkSession.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
        schema)
      .select(col(c), col(out))
    df.join(codes, Seq(c), "left")
      .withColumn(out, coalesce(col(out), lit(-1L)))
  }

  /** pandas unstack(level): pivot `level`'s categories into columns,
    * one row per remaining index, null where the (index, category)
    * pair is absent. `categories` must be supplied (pandas knows them
    * from the index; passing them here keeps this a single shuffle
    * with no discovery job). Cells are first(value) — unstack assumes
    * the (ids, level) pairs are unique, as pandas does. */
  def unstack(df: DataFrame, ids: Seq[String], level: String, value: String,
              categories: Seq[String]): DataFrame =
    df.groupBy(ids.map(col): _*)
      .pivot(level, categories)
      .agg(first(col(value)))

  /** pandas stack(): wide -> long, one row per (index, column) pair
    * with non-null value (pandas drops NaN by default). Generate over
    * the scan — zero shuffle. */
  def stack(df: DataFrame, ids: Seq[String], valueCols: Seq[String],
            varName: String, valName: String): DataFrame = {
    val pairs = valueCols.flatMap(c =>
      Seq(lit(c), col(c).cast("double")))
    df.select(ids.map(col) :+
        explode(map(pairs: _*)).as(Seq(varName, valName)): _*)
      .filter(col(valName).isNotNull)
  }

  private def secondOfDay(ts: Column): Column =
    hour(ts) * 3600 + minute(ts) * 60 + second(ts)

  /** pandas between_time(start, end): rows whose TIME-OF-DAY falls in
    * [start, end] (inclusive both ends, pandas default). "HH:mm:ss"
    * strings. Pure codegen filter — pushes to the scan. */
  def betweenTime(ts: Column, start: String, end: String): Column = {
    def s(t: String): Int = {
      val p = t.split(":").map(_.toInt)
      p(0) * 3600 + (if (p.length > 1) p(1) * 60 else 0) +
        (if (p.length > 2) p(2) else 0)
    }
    secondOfDay(ts).between(s(start), s(end))
  }

  /** pandas at_time(t): exact time-of-day match. */
  def atTime(ts: Column, t: String): Column = {
    val p = t.split(":").map(_.toInt)
    val sec = p(0) * 3600 + (if (p.length > 1) p(1) * 60 else 0) +
      (if (p.length > 2) p(2) else 0)
    secondOfDay(ts) === sec
  }

  /** pandas Series.searchsorted(probes): for each probe value, the
    * insertion index that keeps the sorted series sorted — side='left'
    * counts elements strictly below, side='right' counts <=. The
    * series itself is NEVER sorted: each position is one conditional
    * count, all probes share ONE aggregate pass (map-side combined),
    * and the |probes|-row result explodes from a single row. */
  def searchsorted(df: DataFrame, c: String,
                   probes: Seq[Double]): DataFrame = {
    val aggs = probes.zipWithIndex.flatMap { case (v, i) =>
      Seq(sum(when(col(c) < v, 1L).otherwise(0L)).as(s"__l$i"),
        sum(when(col(c) <= v, 1L).otherwise(0L)).as(s"__r$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = probes.indices.map(i =>
      struct(lit(probes(i)).as("probe"), col(s"__l$i").as("pos_left"),
        col(s"__r$i").as("pos_right")))
    one.select(explode(array(rows: _*)).as("__s")).select(col("__s.*"))
  }
}
