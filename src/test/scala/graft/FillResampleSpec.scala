package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Fill, Resample}

/** Fill family + resample vs hand-computed pandas 2.x:
  * s = Series([1, NaN, NaN, 4]):
  *   s.ffill(limit=1)            = [1, 1, NaN, 4]
  *   s.bfill(limit=1)            = [1, NaN, 4, 4]
  *   s.interpolate()             = [1, 2, 3, 4]
  * Series([NaN, 2, NaN]).interpolate() = [NaN, 2, 2]  (leading stays,
  * trailing pads). */
class FillResampleSpec extends SparkSpec {
  import spark.implicits._

  private val byI = Window.orderBy("i")

  test("ffill / bfill with and without limit") {
    val df = Seq(Some(1.0), None, None, Some(4.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
    val out = df.select(col("i"),
      Fill.ffill(col("v"), byI).as("f"),
      Fill.ffill(col("v"), byI, Some(1)).as("f1"),
      Fill.bfill(col("v"), byI).as("b"),
      Fill.bfill(col("v"), byI, Some(1)).as("b1")).orderBy("i")
    assertSeqApprox(colD(out, "f"), Seq(1.0, 1.0, 1.0, 4.0).map(Some(_)))
    assertSeqApprox(colD(out, "f1"), Seq(Some(1.0), Some(1.0), None, Some(4.0)))
    assertSeqApprox(colD(out, "b"), Seq(1.0, 4.0, 4.0, 4.0).map(Some(_)))
    assertSeqApprox(colD(out, "b1"), Seq(Some(1.0), None, Some(4.0), Some(4.0)))
  }

  test("interpolate: linear between valids, pad after last, null before first") {
    val df = Seq(None, Some(1.0), None, None, Some(4.0), None).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
    val out = Fill.interpolate(df, "v", "vi", byI).orderBy("i")
    assertSeqApprox(colD(out, "vi"),
      Seq(None, Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(4.0)))
  }

  test("resample('M'): buckets, gap periods, pandas empty-bucket semantics") {
    // Jan has two rows, February is EMPTY, March one row
    val df = Seq(
      ("2024-01-05 10:00:00", 1.0), ("2024-01-20 11:00:00", 3.0),
      ("2024-03-02 09:00:00", 5.0))
      .map { case (t, v) => (Timestamp.valueOf(t), v) }.toDF("ts", "v")
    val out = Resample.resampleAgg(df, "ts", "M",
      Seq(("v", "sum"), ("v", "mean"), ("v", "count"))).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("2024-01", "2024-02", "2024-03"))
    val feb = out(1)
    assert(feb.getDouble(1) == 0.0)   // sum of empty bucket -> 0
    assert(feb.isNullAt(2))           // mean -> null (pandas NaN)
    assert(feb.getLong(3) == 0L)      // count -> 0
    assert(out(0).getDouble(1) == 4.0 && out(0).getDouble(2) == 2.0)
    assert(out(2).getLong(3) == 1L)
    // fillGaps=false skips February entirely
    assert(Resample.resampleAgg(df, "ts", "M", Seq(("v", "sum")),
      fillGaps = false).collect().map(_.getString(0)).toSeq ==
      Seq("2024-01", "2024-03"))
    intercept[IllegalArgumentException] {
      Resample.resampleAgg(df, "ts", "M", Seq(("v", "nope")))
    }
  }

  test("resample spine covers W and D freqs") {
    val df = Seq(
      ("2024-03-01 00:00:00", 1.0), ("2024-03-15 00:00:00", 2.0))
      .map { case (t, v) => (Timestamp.valueOf(t), v) }.toDF("ts", "v")
    val d = Resample.resampleAgg(df, "ts", "D", Seq(("v", "count"))).collect()
    assert(d.length == 15 && d.map(_.getLong(1)).sum == 2)
    val w = Resample.resampleAgg(df, "ts", "W", Seq(("v", "count"))).collect()
    // 2024-03-01 is a Friday (week of Feb 26), 03-15 a Friday (week of
    // Mar 11) -> 3 weekly periods, labels are Mon..Sun spans
    assert(w.map(_.getString(0)).toSeq == Seq(
      "2024-02-26/2024-03-03", "2024-03-04/2024-03-10", "2024-03-11/2024-03-17"))
    assert(w.map(_.getLong(1)).toSeq == Seq(1L, 0L, 1L))
  }
}
