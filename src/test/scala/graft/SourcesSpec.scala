package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.IO

/** Round-trip the source/sink layer through a temp dir. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_io").toString

  test("parquet round-trip with explicit schema") {
    val dir = tmp() + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    df.write.parquet(dir)
    val back = IO.readParquet(spark, dir, Some(df.schema))
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("csv and json-lines round-trip") {
    val base = tmp()
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    df.write.option("header", "true").csv(base + "/c")
    df.write.json(base + "/j")
    assert(IO.readCsv(spark, base + "/c").count() == 2)
    val j = IO.readJsonLines(spark, base + "/j", Some(df.schema))
    assert(j.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("x", "y"))
  }

  test("orc round-trip with pushdown-capable scan") {
    val dir = tmp() + "/o"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    IO.writeOrc(df, dir)
    val back = IO.readOrc(spark, dir, Some(df.schema)).filter(col("id") > 1)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("b", "c"))
    // the filter reaches the ORC scan as a pushed predicate
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"))
  }

  test("row ids: sparse unique; dense 0..n-1") {
    val df = Seq("a", "b", "c").toDF("s")
    val sparse = IO.withRowId(df).select("row_id").collect().map(_.getLong(0))
    assert(sparse.distinct.length == 3)
    val dense = IO.withRowId(df, dense = true)
      .select("row_id").collect().map(_.getLong(0)).sorted
    assert(dense.toSeq == Seq(0L, 1L, 2L))
  }

  test("partitioned write prunes to one directory per key") {
    val dir = tmp() + "/p"
    val df = Seq((1L, "us"), (2L, "de"), (3L, "us")).toDF("id", "cc")
    IO.writePartitioned(df, dir, Seq("cc"))
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("cc=")) == 2)
    val us = IO.readParquet(spark, dir).filter(col("cc") === "us")
    assert(us.count() == 2)
    // the partition filter must prune at the scan, not post-filter
    val plan = us.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(cc"), plan)
  }

  test("bucketed table: co-bucketed self-join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS io_bkt")
    // a previously-failed run can leave the location without the table
    val loc = new java.io.File("spark-warehouse/io_bkt")
    if (loc.exists()) {
      loc.listFiles().foreach(_.delete()); loc.delete()
    }
    IO.writeBucketed(Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v"), "io_bkt", "k", 4)
    // disable broadcast so the planner actually exercises the bucketed
    // sort-merge path (a 2-row table would otherwise broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("io_bkt")
      val joined = t.join(t.withColumnRenamed("v", "v2"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString()
      // bucket layout replaces the hash-partitioning shuffle on both sides
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shard export: exact file count, balanced, deterministic, lossless") {
    val dir = tmp() + "/shards"
    val df = (1L to 1000L).map(i => (i, s"doc$i")).toDF("id", "t")
    IO.writeShards(df, dir, "id", shards = 8, sortWithin = Seq("id"))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 8)
    val back = IO.readParquet(spark, dir)
    assert(back.count() == 1000)
    // balance: no shard more than 2x the ideal 125 rows
    val counts = files.map(f =>
      spark.read.parquet(f.getAbsolutePath).count())
    assert(counts.sum == 1000 && counts.max <= 250, counts.toSeq)
    // determinism: a re-run shards identically
    val dir2 = tmp() + "/shards2"
    IO.writeShards(df, dir2, "id", shards = 8, sortWithin = Seq("id"))
    val files2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val again = files2.map(f => spark.read.parquet(f.getAbsolutePath).count())
    assert(again.sorted.toSeq == counts.sorted.toSeq)
  }
}
