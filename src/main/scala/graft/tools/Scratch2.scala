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
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("warm")(df.count())
    // kernel only: hash-set shingles per doc
    val docs = graft.engine.Core.spread(df)
      .select(col("doc_id").as("doc"),
        Dedup.shingleSetForProfile(3)(Dedup.words(col("text"))).as("shl"))
    t("kernel_only")(docs.select(sum(size(col("shl")))).collect())
    t("kernel_only2")(docs.select(sum(size(col("shl")))).collect())
    // exploded shuffle rows
    val sh = docs.select(col("doc"), size(col("shl")).as("sz"),
      explode(col("shl")).as("s"))
    t("explode_count")(println(sh.count()))
    // stage 1: groupByKey + flatMapGroups pair stream (no final agg)
    val pairs = sh.select(col("s"), col("doc"), col("sz")).as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroups { (_: Long, it: Iterator[(Long, Long, Int)]) =>
        val buf = new scala.collection.mutable.ArrayBuffer[(Long, Int)](8)
        var n = 0
        while (it.hasNext) { val x = it.next(); n += 1; if (n <= 1001) buf += ((x._2, x._3)) }
        if (n > 1000) Iterator.empty
        else for {
          i <- buf.indices.iterator
          j <- (i + 1 until buf.length).iterator
        } yield (buf(i)._1, buf(j)._1)
      }
    t("pair_stream_count")(println(pairs.rdd.count()))
    (1 to 3).foreach { i =>
      t(s"full_query$i")(graft.SparkEntry.queries("q_ngram_jaccard")(spark, sfDir).count())
    }
    spark.stop()
  }
}
