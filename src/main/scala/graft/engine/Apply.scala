package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** UDF-application surface: applymap, Series.map(dict), chunk_apply.
  *
  * Reference: `p_applymap`/`p_map` (`/root/reference/parallel_pandas/core/
  * parallel_dataframe.py:388-429`), `Series.p_map` with dict argument
  * (`parallel_series.py:47-68`), `chunk_apply` with `split_by_col`
  * (`parallel_dataframe.py:66-97`).
  *
  * Spark-native shapes: applymap is a projection (stays in codegen);
  * dict-map is a literal-map lookup (broadcast-join for big dicts);
  * chunk_apply is `mapPartitions`, with `split_by_col` becoming a
  * hash repartition so equal keys land in one partition — the exact
  * semantics the reference documents for its chunker.
  */
object Apply {

  /** Elementwise scalar function over every cell of the given columns
    * (pandas applymap / pandas-2 DataFrame.map). One projection —
    * codegen'd. `naAction = Some("ignore")` keeps null cells null
    * without invoking `f` on them (pandas `na_action='ignore'`). */
  def applymap(df: DataFrame, cols: Seq[String], f: Column => Column,
               naAction: Option[String] = None): DataFrame =
    df.select(df.columns.map { c =>
      if (cols.contains(c)) {
        val applied = naAction match {
          case Some("ignore") =>
            when(col(c).isNull, lit(null)).otherwise(f(col(c)))
          case _ => f(col(c))
        }
        applied.as(c)
      } else col(c)
    }.toIndexedSeq: _*)

  /** Series.map(dict): lookup table as a map literal; keys absent from
    * the dict map to null (pandas na_action=None behavior for missing
    * keys). For dictionaries too large for a literal, broadcast-join a
    * mapping table instead — same semantics, same plan shape. */
  def mapDict(c: Column, m: Map[String, String]): Column =
    element_at(typedLit(m), c)

  /** isin against a VALUE TABLE (SURVEY §2.4: large value lists don't
    * belong in a literal) — broadcast left-semi membership turned into a
    * boolean flag column via the join-or-null pattern. */
  def isinTable(df: DataFrame, c: String, values: DataFrame,
                valueCol: String, outCol: String): DataFrame = {
    val marks = values.select(col(valueCol).as(c)).distinct()
      .withColumn("__hit", lit(true))
    df.join(broadcast(marks), Seq(c), "left")
      .withColumn(outCol, coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }

  /** chunk_apply: an arbitrary function over whole chunks (partitions).
    * `splitBy` reproduces `split_by_col`: hash-repartition so all rows
    * with equal keys share a partition; the function then sees complete
    * key groups. */
  def chunkApply[T, U: Encoder](ds: Dataset[T], splitBy: Option[Column])
                               (f: Iterator[T] => Iterator[U]): Dataset[U] = {
    val prep = splitBy.map(ds.repartition(_)).getOrElse(ds)
    prep.mapPartitions(f)
  }
}
