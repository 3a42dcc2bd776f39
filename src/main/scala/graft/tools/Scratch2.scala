package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Dev-only: stage-by-stage timing of the jaccard pipeline. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("warm")(df.count())
    val dfs = graft.engine.Core.spread(df)
    val docs = dfs.withColumn("__w", Dedup.words(col("text")))
      .select(col("doc_id").as("doc"),
        array_distinct(Dedup.shinglesFromWords(col("__w"), 3)).as("shl"))
    t("docs_arrays")(println(docs.select(sum(size(col("shl")))).collect().mkString))
    docs.explain(true)
    val sh = docs.select(col("doc"), size(col("shl")).as("sz"), explode(col("shl")).as("s"))
    t("sh_explode")(sh.count())
    val shc = t("sh_checkpoint")(sh.localCheckpoint())
    val selfJoin = shc.select(col("doc").as("doc1"), col("s"))
      .join(shc.select(col("doc").as("doc2"), col("s")), Seq("s"))
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
    t("self_join")(selfJoin.count())
    t("self_join2")(selfJoin.count())
    (1 to 3).foreach { i =>
      t(s"full_query$i")(graft.SparkEntry.queries("q_ngram_jaccard")(spark, sfDir).count())
    }
    spark.stop()
  }
}
