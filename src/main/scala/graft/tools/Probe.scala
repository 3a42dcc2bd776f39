package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling harness — deleted before end of round.
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    t("warmup groupBy")(df.groupBy("source").count().count())
    val win = 30
    val pos = graft.engine.Core.spread(df.select(col("doc_id"), col("text").as("__t")))
      .filter(length(col("__t")) >= win)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("__t")) - (win - 1), lit(1))).as("__p"),
        col("__t"))
      .select(col("doc_id"), col("__p").cast("long").as("__p"),
        col("__t").substr(col("__p"), lit(win)).as("__w"))
      .select(col("doc_id"), col("__p"),
        xxhash64(col("__w")).as("__h"), xxhash64(lit(1), col("__w")).as("__h2"))
    t("explode+hash only")(pos.count())
    val dup = pos.groupBy(col("__h"), col("__h2")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select(col("__h"), col("__h2"))
    t("dup agg")(dup.count())
    val hits = pos.join(dup, Seq("__h", "__h2"), "left_semi")
    t("semi join")(hits.count())
    t("full spans")(graft.pipeline.Dedup.substringSpans(df, "doc_id", "text", 30).count())
    t("full spans again")(graft.pipeline.Dedup.substringSpans(df, "doc_id", "text", 30).count())
    spark.stop()
  }
}
