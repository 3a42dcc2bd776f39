package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 temp profiling main (deleted before round end). */
object Prof4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/lineitem.parquet").groupBy("l_returnflag").count().count()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      System.gc()
    }
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    println("[prof] embeddings partitions = " +
      emb.rdd.getNumPartitions + " rows = " + emb.count())
    val docs = spark.read.parquet(s"$d/documents.parquet")
    println("[prof] documents partitions = " + docs.rdd.getNumPartitions +
      " rows = " + docs.count())
    time("ann_cosine: scan+norm only") {
      emb.select(col("vec_id"),
        graft.functions.VectorFunctions.l2norm(col("embedding").cast("array<double>")).as("n"))
        .agg(sum("n")).collect()
    }
    time("ann_cosine: full query") {
      graft.PipelineQueries.all("q_ann_cosine")(spark, d).count()
    }
    time("ann_cosine: full again") {
      graft.PipelineQueries.all("q_ann_cosine")(spark, d).count()
    }
    time("ann_cosine: no orderBy") {
      val q = emb.filter(col("vec_id") < 10)
      graft.pipeline.Similarity.bruteForceTopK(q, emb, 5).count()
    }
    time("dedup_clusters: pairs only") {
      graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 3, bands = 4, rowsPerBand = 2).count()
    }
    time("dedup_clusters: full") {
      graft.PipelineQueries.all("q_dedup_clusters")(spark, d).count()
    }
    time("ngram_jaccard: full") {
      graft.PipelineQueries.all("q_ngram_jaccard")(spark, d).count()
    }
    time("describe: full") {
      graft.Queries.all("q_describe")(spark, d).count()
    }
    time("simhash_pairs: full") {
      graft.PipelineQueries.all("q_simhash_pairs")(spark, d).count()
    }
    spark.stop()
  }
}
