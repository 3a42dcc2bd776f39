package graft

import org.apache.spark.sql.functions._
import graft.engine.Reshape

/** Reshape family vs hand-computed pandas 2.x behavior. */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("melt: wide to long, id vars repeated, declared value type") {
    val df = Seq((1L, 10, 1.5), (2L, 20, 2.5)).toDF("id", "a", "b")
    val out = Reshape.melt(df, Seq("id"), Seq("a", "b"))
      .orderBy("id", "variable").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 10.0), (1L, "b", 1.5), (2L, "a", 20.0), (2L, "b", 2.5)))
  }

  test("crosstab: sorted value columns, zero-filled cells") {
    val df = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "q")).toDF("a", "b")
    val out = Reshape.crosstab(df, "a", "b").orderBy("a").collect()
    assert(out.head.schema.fieldNames.toSeq == Seq("a", "p", "q"))
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("x", 2L, 1L), ("y", 0L, 1L)))
    // discovery collect is capped: high-cardinality b fails loudly
    // instead of OOMing the driver (same guard as get_dummies)
    assertThrows[IllegalArgumentException] {
      Reshape.crosstab(df, "a", "b", maxCategories = 1)
    }
  }

  test("cut: right-closed bins, include_lowest, outside -> null") {
    val df = Seq(0.0, 1.0, 10.0, 10.5, 25.0, 60.0).toDF("v")
    val out = df.select(col("v"),
        Reshape.cut(col("v"), Seq(0.0, 10.0, 25.0, 50.0)).as("c"),
        Reshape.cut(col("v"), Seq(0.0, 10.0, 25.0, 50.0),
          includeLowest = true).as("cl"))
      .orderBy("v").collect()
    def g(i: Int, j: Int): Option[Int] =
      if (out(i).isNullAt(j)) None else Some(out(i).getInt(j))
    // v=0.0: outside (lo open) unless include_lowest
    assert(g(0, 1).isEmpty && g(0, 2).contains(0))
    assert(g(1, 1).contains(0))           // 1.0 -> (0,10]
    assert(g(2, 1).contains(0))           // 10.0 -> (0,10] (right-closed)
    assert(g(3, 1).contains(1))           // 10.5 -> (10,25]
    assert(g(4, 1).contains(1))           // 25.0 -> (10,25]
    assert(g(5, 1).isEmpty)               // 60 -> outside
  }

  test("qcut: quartile codes balance and cover min/max") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Reshape.qcut(df, "v", 4, "q").groupBy("q").count()
      .orderBy("q").collect().map(r => r.getInt(0) -> r.getLong(1))
    // pandas qcut(1..100, 4) -> 4 bins of 25
    assert(out.toSeq == Seq(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L))
  }

  test("qcut exact=false: approx edges land every code within one " +
    "bucket of exact, identical here (accuracy >> n)") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    // at accuracy=10000 on 100 rows the sketch is lossless: codes match
    // the exact path cell for cell
    val exact = Reshape.qcut(df, "v", 4, "q").orderBy("v")
      .collect().map(_.getInt(1)).toSeq
    val approx = Reshape.qcut(df, "v", 4, "q", exact = false).orderBy("v")
      .collect().map(_.getInt(1)).toSeq
    assert(approx == exact)
    // at a coarse accuracy the codes may differ only NEAR an edge, and
    // never by more than one bucket
    val coarse = Reshape.qcut(df, "v", 4, "q", exact = false,
      accuracy = 10).orderBy("v").collect().map(_.getInt(1)).toSeq
    coarse.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 1, s"approx code $a vs exact $e") }
  }

  test("drop_duplicates: keep first / last / none under explicit order") {
    val df = Seq((1L, "k1", "a"), (2L, "k1", "b"), (3L, "k2", "c"))
      .toDF("ord", "k", "payload")
    def ords(keep: String): Seq[Long] =
      Reshape.dropDuplicates(df, Seq("k"), "ord", keep)
        .orderBy("ord").collect().map(_.getLong(0)).toSeq
    assert(ords("first") == Seq(1L, 3L))
    assert(ords("last") == Seq(2L, 3L))
    assert(ords("false") == Seq(3L))
    intercept[IllegalArgumentException] {
      Reshape.dropDuplicates(df, Seq("k"), "ord", "nope")
    }
  }

  test("groupby positional: cumcount, nth, head") {
    val df = Seq((1L, "g1"), (2L, "g1"), (3L, "g1"), (4L, "g2"))
      .toDF("ord", "g")
    val cc = df.withColumn("cc", Reshape.cumcount(Seq("g"), "ord"))
      .orderBy("ord").collect().map(_.getInt(2)).toSeq
    assert(cc == Seq(0, 1, 2, 0))
    assert(Reshape.nth(df, Seq("g"), "ord", 1).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))  // g2 has no position 1
    assert(Reshape.headPerGroup(df, Seq("g"), "ord", 2)
      .orderBy("ord").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
  }
}
