package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end timing of Dedup.clusters at a given SF (pair generation +
  * connected components), used to validate round cost stays flat. */
object ScratchCC {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.engine.Core.normalizeTs(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val t0 = System.nanoTime()
    val pairs = graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text")
    println(s"[cc] pairs: ${pairs.count()} (${(System.nanoTime() - t0) / 1e9}s)")
    val t1 = System.nanoTime()
    val cc = graft.pipeline.Dedup.clusters(pairs)
    val reps = cc.agg(count(lit(1)), count_distinct(col("cluster_rep"))).collect()(0)
    println(s"[cc] clusters: docs=${reps.getLong(0)} reps=${reps.getLong(1)} " +
      s"(${(System.nanoTime() - t1) / 1e9}s)")
    spark.stop()
  }
}
