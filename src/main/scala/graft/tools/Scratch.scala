package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Ad-hoc timing breakdown (dev scratch, not part of the library). */
object Scratch {
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
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    li.groupBy("l_returnflag").count().count() // warm
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      System.gc()
    }
    val base = li.filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .select(col("l_quantity").as("__a"), col("l_extendedprice").as("__b"))

    var cuts: Array[Double] = null
    time("cuts job") {
      cuts = base.stat.approxQuantile("__b", (1 until 32).map(_.toDouble / 32).toArray, 0.01)
        .distinct.sorted
    }
    def bucketOf(v: Column): Column =
      cuts.foldLeft(lit(0))((acc, cut) => acc + when(v > lit(cut), 1).otherwise(0))
    time("partials+offs collect") {
      base.filter(col("__b").isNotNull)
        .groupBy(bucketOf(col("__b")).as("__bkt"))
        .agg(count(lit(1)).cast("double").as("__pn")).collect()
    }
    time("bucket expr scan only") {
      base.select(bucketOf(col("__b")).as("__bkt")).groupBy("__bkt").count().collect()
    }
    val offs = {
      val partials = base.filter(col("__b").isNotNull)
        .groupBy(bucketOf(col("__b")).as("__bkt"))
        .agg(count(lit(1)).cast("double").as("__pn"))
      val wOff = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
      partials.withColumn("__off", coalesce(sum(col("__pn")).over(wOff), lit(0.0)))
        .select(col("__bkt"), col("__off"))
    }
    val wCum = Window.partitionBy("__bkt").orderBy(col("__b"))
    val wTie = wCum.rangeBetween(Window.currentRow, Window.currentRow)
    val main = base.withColumn("__bkt", bucketOf(col("__b")))
      .join(broadcast(offs), Seq("__bkt"), "left")
      .withColumn("rb", when(col("__b").isNotNull,
        col("__off") + count(col("__b")).over(wCum).cast("double")
          - count(col("__b")).over(wTie)
          + (count(col("__b")).over(wTie) + 1) / 2.0))
    time("main window job") {
      main.agg(avg(col("rb"))).collect().foreach(r => println("  avg_rb=" + r.get(0)))
    }
    time("main window job again") {
      main.agg(avg(col("rb"))).collect()
    }
    time("window only (no offs join)") {
      base.withColumn("__bkt", bucketOf(col("__b")))
        .withColumn("rb", count(col("__b")).over(wCum).cast("double")
          - count(col("__b")).over(wTie))
        .agg(avg(col("rb"))).collect()
    }
    time("shuffle+sort only") {
      base.withColumn("__bkt", bucketOf(col("__b")))
        .repartition(32, col("__bkt"))
        .sortWithinPartitions("__b").agg(avg(col("__b"))).collect()
    }
    main.agg(avg(col("rb"))).explain("formatted")
    spark.stop()
  }
}
