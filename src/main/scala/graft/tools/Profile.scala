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

    // warmup: one trivial job so codegen/classloading isn't charged below
    time("warmup") {
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    }

    val emb = graft.engine.Core.normalizeTs(
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    println(s"[profile] embeddings: ${emb.count()}")

    time("ann: corpus norm only") {
      val c = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("cv"))
      c.withColumn("cn", sqrt(aggregate(transform(col("cv"), x => x * x),
        lit(0.0), (acc, x) => acc + x))).agg(sum("cn")).collect()
    }
    time("ann: full bruteForceTopK") {
      graft.pipeline.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, k = 5).count()
    }
    time("ann: full bruteForceTopK 2nd run") {
      graft.pipeline.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, k = 5).count()
    }

    val docs = graft.engine.Core.normalizeTs(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    time("minhash: signatures only") {
      graft.engine.Core.spread(docs).select(col("doc_id"),
        graft.pipeline.Dedup.minhashSigUdf(3, 8)(
          graft.pipeline.Dedup.words(col("text")))).agg(count(lit(1))).collect()
    }
    time("minhash: full pairs") {
      graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text").count()
    }
    time("ngram: full pairs") {
      graft.pipeline.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, minJaccard = 0.2).count()
    }
    spark.stop()
  }
}
