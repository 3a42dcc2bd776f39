package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: intermediate cardinalities / timings of the hot
  * pipeline queries at a given SF dir. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val docs0 = graft.engine.Core.normalizeTs(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    println(s"[profile] docs: ${docs0.count()}")

    // ngram_jaccard intermediates
    val k = 3
    val docs = graft.engine.Core.spread(docs0)
      .select(col("doc_id").as("doc"),
        graft.pipeline.Dedup.shingles(col("text"), k).as("shl"))
    val sh = docs
      .select(col("doc"), size(col("shl")).as("sz"), explode(col("shl")).as("s"))
      .localCheckpoint()
    println(s"[profile] shingle rows: ${sh.count()}")
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    println(s"[profile] distinct shingles: ${dfreq.count()}")
    dfreq.select(max("df").as("max_df"), expr("percentile(df, 0.999)").as("p999"),
      sum(col("df") * col("df")).as("sum_df2")).show()
    val hot = dfreq.filter(col("df") > 1000).select("s")
    println(s"[profile] hot shingles: ${hot.count()}")
    val filtered = sh.join(broadcast(hot), Seq("s"), "left_anti")
    val pairs = time("pair explosion count") {
      filtered.select(col("doc").as("doc1"), col("s"))
        .join(filtered.select(col("doc").as("doc2"), col("s")), Seq("s"))
        .filter(col("doc1") < col("doc2")).count()
    }
    println(s"[profile] intermediate pairs: $pairs")
    val grouped = time("pair groupBy count") {
      filtered.select(col("doc").as("doc1"), col("s"))
        .join(filtered.select(col("doc").as("doc2"), col("s")), Seq("s"))
        .filter(col("doc1") < col("doc2"))
        .groupBy("doc1", "doc2").agg(count(lit(1))).count()
    }
    println(s"[profile] distinct pairs: $grouped")
    spark.stop()
  }
}
