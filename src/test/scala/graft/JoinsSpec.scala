package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.engine.Joins

/** As-of join (pandas merge_asof semantics, hand-computed oracles) and
  * bucketed range join. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  // trades (left): key A at 10:00..; quotes (right): sparse per-key prices
  private lazy val trades = Seq(
    (1L, "A", ts(10)),
    (2L, "A", ts(20)),
    (3L, "A", ts(30)),
    (4L, "B", ts(15)),
    (5L, "C", ts(5))).toDF("trade_id", "sym", "t")
  private lazy val quotes = Seq(
    ("A", ts(10), 1.0),   // exactly at trade 1
    ("A", ts(25), 2.0),
    ("B", ts(40), 3.0)).toDF("sym", "t", "px")

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("asof backward: latest at-or-before match per key") {
    val out = run(Joins.asof(trades, quotes, on = "t", by = Seq("sym")))
    assert(out == Map(
      1L -> Some(1.0),   // exact match included by default
      2L -> Some(1.0),
      3L -> Some(2.0),
      4L -> None,        // B's only quote is later
      5L -> None))       // C has no quotes
  }

  test("asof backward: allowExactMatches=false skips the equal timestamp") {
    val out = run(Joins.asof(trades, quotes, on = "t", by = Seq("sym"),
      allowExactMatches = false))
    assert(out(1L).isEmpty)       // 10:00 quote no longer eligible
    assert(out(3L) == Some(2.0))  // strictly-before still fine
  }

  test("asof forward: earliest at-or-after match per key") {
    val out = run(Joins.asof(trades, quotes, on = "t", by = Seq("sym"),
      direction = Joins.Forward))
    assert(out == Map(
      1L -> Some(1.0),
      2L -> Some(2.0),
      3L -> None,
      4L -> Some(3.0),
      5L -> None))
  }

  test("asof backward with tolerance: stale matches null out") {
    val out = run(Joins.asof(trades, quotes, on = "t", by = Seq("sym"),
      toleranceUs = Some(6L * 60 * 1000000L))) // 6 minutes
    assert(out(3L) == Some(2.0))  // 5 min stale: kept
    assert(out(2L).isEmpty)       // 10 min stale: dropped
  }

  test("asof nearest: picks the closer side, ties go backward") {
    val out = run(Joins.asof(trades, quotes, on = "t", by = Seq("sym"),
      direction = Joins.Nearest))
    assert(out(2L) == Some(2.0))  // 25 is 5 away vs 10 at 10 away
    assert(out(3L) == Some(2.0))
    assert(out(4L) == Some(3.0))  // only a forward candidate exists
    assert(out(5L).isEmpty)
    // tie: trade at 17:30 between quotes at 10 and 25 -> backward wins
    val tie = Seq((9L, "A", new Timestamp(1050000L))).toDF("trade_id", "sym", "t")
    val t = run(Joins.asof(tie, quotes, on = "t", by = Seq("sym"),
      direction = Joins.Nearest))
    assert(t(9L) == Some(1.0))
  }

  test("asof suffixes clashing right columns with _y") {
    val r2 = quotes.withColumnRenamed("px", "trade_id") // clash on purpose
    val cols = Joins.asof(trades, r2, on = "t", by = Seq("sym")).columns
    assert(cols.contains("trade_id") && cols.contains("trade_id_y"))
  }

  test("range join: points inside [lo, hi] per key, bucket-width agnostic") {
    val intervals = Seq((100L, "A", ts(10), ts(20)), (200L, "A", ts(18), ts(25)))
      .toDF("iid", "sym", "lo", "hi")
    val points = Seq((1L, "A", ts(5)), (2L, "A", ts(12)), (3L, "A", ts(19)),
      (4L, "A", ts(25)), (5L, "B", ts(12))).toDF("pid", "sym", "pt")
    def pairs(bucketUs: Long) =
      Joins.rangeJoin(intervals, col("lo"), col("hi"), points, col("pt"),
        by = Seq("sym"), bucketUs = bucketUs)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = Set((100L, 2L), (100L, 3L), (200L, 3L), (200L, 4L))
    assert(pairs(60L * 1000000L) == expect)       // 1-minute buckets
    assert(pairs(3600L * 1000000L) == expect)     // one giant bucket
    assert(pairs(7L * 60 * 1000000L) == expect)   // width not dividing bounds
  }
}
