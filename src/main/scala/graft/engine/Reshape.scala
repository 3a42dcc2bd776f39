package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** pandas-core reshaping / binning / positional ops the reference
  * proxies wholesale: melt, crosstab, cut/qcut, drop_duplicates(keep=),
  * groupby cumcount/nth/head (`parallel_pandas` forwards any pandas
  * method through its accessor; these are the remaining commonly-
  * parallelized ones outside §2.7/2.8's pivot/merge family).
  *
  * Scale shapes: melt is a generate over the scan (zero shuffle);
  * crosstab is one hash aggregate (column set = bounded distinct
  * collect, the same data-dependent schema discovery pandas does);
  * cut is a pure codegen when-chain; qcut adds ONE exact-quantile
  * probe; drop_duplicates and the positional family are one window
  * shuffle on the subset/group keys. */
object Reshape {

  /** pandas melt: wide -> long. All value columns are cast to the
    * common `valueType` (pandas melts into one object column; a typed
    * engine must pick the supertype). Zero shuffle — a `stack`
    * Generate over the scan. */
  def melt(df: DataFrame, idVars: Seq[String], valueVars: Seq[String],
           varName: String = "variable", valueName: String = "value",
           valueType: String = "double"): DataFrame = {
    require(valueVars.nonEmpty, "melt: need at least one value column")
    val pairs = valueVars.map(v =>
      s"'$v', CAST(`$v` AS $valueType)").mkString(", ")
    df.select(idVars.map(col) :+
      expr(s"stack(${valueVars.size}, $pairs) AS (`$varName`, `$valueName`)")
        .as(Seq(varName, valueName)): _*)
  }

  /** pandas crosstab(a, b): count matrix with one column per distinct
    * `b` value (sorted). The column set is a BOUNDED distinct collect —
    * the same data-dependent schema discovery pandas does, capped at
    * `maxCategories` with a loud failure above it (a high-cardinality
    * `b` would otherwise OOM the driver; same guard as
    * [[Frame.getDummies]]) — then ONE hash aggregate; absent cells
    * are 0. */
  def crosstab(df: DataFrame, a: String, b: String,
               maxCategories: Int = 10000): DataFrame = {
    val vals = df.select(col(b).cast("string")).distinct()
      .limit(maxCategories + 1).collect().map(_.getString(0))
      .filter(_ != null).sorted
    require(vals.length <= maxCategories,
      s"crosstab: > $maxCategories categories in '$b'")
    val piv = df.groupBy(col(a))
      .pivot(col(b).cast("string"), vals.toSeq)
      .agg(count(lit(1)))
    // explicit backticked coalesce, not na.fill: a category value with
    // a dot ("2.0") would otherwise be parsed as a nested field path
    piv.select(col(a) +:
      vals.toSeq.map(v => coalesce(col(s"`$v`"), lit(0L)).as(v)): _*)
  }

  /** pandas cut(x, bins, labels=False): right-closed intervals
    * (lo, hi], integer codes 0..bins-2, null outside — a pure codegen
    * when-chain, zero shuffle. `includeLowest` pulls the first bin's
    * lower edge closed (pandas include_lowest=True). */
  def cut(c: Column, bins: Seq[Double],
          includeLowest: Boolean = false): Column = {
    require(bins.size >= 2 && bins == bins.sorted, "cut: need sorted bin edges")
    val first =
      if (includeLowest) when(c >= bins.head && c <= bins(1), 0)
      else when(c > bins.head && c <= bins(1), 0)
    (2 until bins.size).foldLeft(first) { (acc, i) =>
      acc.when(c > bins(i - 1) && c <= bins(i), i - 1)
    }
  }

  /** pandas qcut(x, q, labels=False): codes from quantile edges.
    * ONE quantile probe (a single aggregate job) computes the q+1 cut
    * points; the bucketing itself is then a [[cut]] when-chain with
    * include_lowest. Edges are rounded to 6 decimals on BOTH engine
    * and oracle sides: the two engines' linear interpolations can
    * differ by an ulp, and an unrounded edge could flip a point
    * sitting exactly on it.
    *
    * `exact=true` (the pandas-parity default, and what the DuckDB
    * oracle replicates) probes with [[Reductions.quantilesBySort]] — a
    * range-partitioned distributed sort plus a rank lookup, NO
    * per-partial value buffer, so the exact path itself survives scale
    * (and runs ~5x faster than Catalyst `percentile`'s boxed
    * value->count map on mostly-distinct doubles). `exact=false`
    * probes with `percentile_approx` (bounded ~`accuracy` buffer per
    * partial, ONE aggregate job, no shuffle-sort); edges then sit
    * within 1/accuracy quantile rank of exact, so only points in that
    * sliver of each edge can land one code off — same toggle pattern
    * as `describeApprox`. */
  def qcut(df: DataFrame, c: String, q: Int,
           out: String = "code", exact: Boolean = true,
           accuracy: Int = 10000): DataFrame = {
    require(q >= 2, "qcut: need q >= 2")
    val probs = (0 to q).map(_.toDouble / q)
    val edges =
      (if (exact) Reductions.quantilesBySort(df, c, probs)
       else df.agg(percentile_approx(col(c).cast("double"),
           array(probs.map(lit): _*), lit(accuracy)).as("p"))
         .collect()(0).getSeq[Double](0))
      .map(v => math.rint(v * 1e6) / 1e6)
    df.withColumn(out, cut(col(c).cast("double"), edges, includeLowest = true))
  }

  /** pandas drop_duplicates(subset, keep='first'|'last'|false) with an
    * explicit deterministic order column (pandas uses input order; a
    * distributed frame has none). One window shuffle on the subset. */
  def dropDuplicates(df: DataFrame, subset: Seq[String], ordCol: String,
                     keep: String = "first"): DataFrame = {
    val part = Window.partitionBy(subset.map(col): _*)
    keep match {
      case "first" =>
        df.withColumn("__rn", row_number().over(part.orderBy(col(ordCol))))
          .filter(col("__rn") === 1).drop("__rn")
      case "last" =>
        df.withColumn("__rn", row_number().over(part.orderBy(col(ordCol).desc)))
          .filter(col("__rn") === 1).drop("__rn")
      case "false" | "none" =>
        df.withColumn("__n", count(lit(1)).over(part))
          .filter(col("__n") === 1).drop("__n")
      case other =>
        throw new IllegalArgumentException(s"drop_duplicates: keep='$other'")
    }
  }

  /** pandas groupby.cumcount(): 0-based position within the group
    * under the explicit order. */
  def cumcount(keys: Seq[String], ordCol: String): Column =
    row_number().over(
      Window.partitionBy(keys.map(col): _*).orderBy(col(ordCol))) - 1

  /** pandas groupby.nth(n): the row at 0-based position n of each
    * group (absent for shorter groups). */
  def nth(df: DataFrame, keys: Seq[String], ordCol: String,
          n: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col(ordCol))))
      .filter(col("__rn") === n + 1).drop("__rn")

  /** pandas groupby.head(n): first n rows per group — WindowGroupLimit
    * bounds per-group state before the final rank filter. */
  def headPerGroup(df: DataFrame, keys: Seq[String], ordCol: String,
                   n: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col(ordCol))))
      .filter(col("__rn") <= n).drop("__rn")
}
