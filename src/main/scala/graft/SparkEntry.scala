package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query definitions live in [[Queries]] (reference-parity surface) and
  * [[PipelineQueries]] (training-data pipeline ops). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.all ++
      Queries5.all ++ Queries6.all ++ Queries7.all ++ Queries8.all ++
      Queries9.all ++ Queries10.all ++ Queries11.all ++
      PipelineQueries.all ++ PipelineQueries2.all ++ PipelineQueries3.all ++
      PipelineQueries4.all ++ PipelineQueries5.all ++
      PipelineQueries6.all ++ StreamQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracle ++ Queries2.oracle ++ Queries3.oracle ++ Queries4.oracle ++
      Queries5.oracle ++ Queries6.oracle ++ Queries7.oracle ++
      Queries8.oracle ++ Queries9.oracle ++ Queries10.oracle ++
      Queries11.oracle ++
      PipelineQueries.oracle ++ PipelineQueries2.oracle ++
      PipelineQueries3.oracle ++ PipelineQueries4.oracle ++
      PipelineQueries5.oracle ++ PipelineQueries6.oracle ++
      StreamQueries.oracle
}
