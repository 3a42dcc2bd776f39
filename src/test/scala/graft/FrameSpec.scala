package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Frame

/** Frame-alignment family vs hand-computed pandas 2.x behavior. */
class FrameSpec extends SparkSpec {
  import spark.implicits._

  private val w = Window.partitionBy("g").orderBy("i")

  test("shift: lag, negative lead, null beyond edges; diff") {
    val df = Seq(("a", 1, 1.0), ("a", 2, 3.0), ("a", 3, 6.0))
      .toDF("g", "i", "v")
    val out = df.select(col("i"),
        Frame.shift(col("v"), 1, w).as("s1"),
        Frame.shift(col("v"), -1, w).as("sm1"),
        Frame.diff(col("v"), 1, w).as("d1"))
      .orderBy("i").collect()
    def g(r: Int, c: Int): Option[Double] =
      if (out(r).isNullAt(c)) None else Some(out(r).getDouble(c))
    // pandas: s.shift(1) = [NaN,1,3]; s.shift(-1) = [3,6,NaN]; s.diff() = [NaN,2,3]
    assert(out.map(r => g(out.indexOf(r), 1)).toSeq ==
      Seq(None, Some(1.0), Some(3.0)))
    assert((0 to 2).map(g(_, 2)) == Seq(Some(3.0), Some(6.0), None))
    assert((0 to 2).map(g(_, 3)) == Seq(None, Some(2.0), Some(3.0)))
  }

  test("nlargest/nsmallest: deterministic tiebreak, top-n only") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0)).toDF("id", "v")
    assert(Frame.nlargest(df, 1, "v", "id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 5.0)))
    assert(Frame.nsmallest(df, 1, "v", "id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((3L, 1.0)))
    assert(Frame.nlargest(df, 2, "v", "id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("corrwith: per-pair Pearson as (colname, corr) rows") {
    val left = Seq((1L, 1.0, 3.0), (2L, 2.0, 2.0), (3L, 3.0, 1.0))
      .toDF("k", "x", "xn")
    val right = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("k", "y")
    val out = Frame.corrwith(left, right, Seq("k"),
        Seq("x" -> "y", "xn" -> "y"))
      .orderBy("colname").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    // y = 2x: corr(x,y) = 1; xn = 4-x: corr(xn,y) = -1
    assert(math.abs(out("x") - 1.0) < 1e-12)
    assert(math.abs(out("xn") + 1.0) < 1e-12)
  }

  test("groupby.filter: keeps all rows of qualifying groups only") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("g", "v")
    val out = Frame.groupFilter(df, Seq("g"), avg(col("v")), _ > 5.0)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // pandas: groupby('g').filter(lambda t: t.v.mean() > 5) -> only b
    assert(out == Seq(("b", 10.0)))
  }

  test("combine_first: left nulls filled, right-only rows appended, " +
       "one-sided columns pass through") {
    val left = Seq((1L, Option.empty[Double], "a"), (2L, Some(5.0), "b"))
      .toDF("k", "x", "name")
    val right = Seq((1L, 9.0, "s1"), (2L, 7.0, "s2"), (3L, 3.0, "s3"))
      .toDF("k", "x", "seg")
    val out = Frame.combineFirst(left, right, Seq("k")).orderBy("k")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getDouble(1)).toSeq == Seq(9.0, 5.0, 3.0))
    assert(out.map(r => Option(r.getString(2))).toSeq ==
      Seq(Some("a"), Some("b"), None))
    assert(out.map(_.getString(3)).toSeq == Seq("s1", "s2", "s3"))
  }

  test("concat outer: columns aligned by name, missing null-filled") {
    val a = Seq((1L, "x1")).toDF("id", "x")
    val b = Seq((2L, "y2")).toDF("id", "y")
    val out = Frame.concatOuter(Seq(a, b)).orderBy("id").collect()
    assert(out.head.schema.fieldNames.toSeq == Seq("id", "x", "y"))
    assert(Option(out(0).getString(2)).isEmpty)   // a rows: y null
    assert(Option(out(1).getString(1)).isEmpty)   // b rows: x null
  }

  test("explode: element per row; empty and null arrays keep a null row") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("id", "arr")
      .union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "arr"))
    val out = Frame.explodeCol(df, "arr", "v").orderBy("id", "v")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    // pandas .explode: [] and NaN both yield one NaN row
    assert(out == Seq((1L, Some("a")), (1L, Some("b")),
      (2L, None), (3L, None)))
  }

  test("get_dummies: sorted category columns, 0/1 cells, category cap") {
    val df = Seq((1L, "q"), (2L, "p"), (3L, "q")).toDF("id", "c")
    val out = Frame.getDummies(df, "c", "d").orderBy("id").collect()
    assert(out.head.schema.fieldNames.toSeq == Seq("id", "c", "d_p", "d_q"))
    assert(out.map(r => (r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 1), (1, 0), (0, 1)))
    assertThrows[IllegalArgumentException] {
      Frame.getDummies(df, "c", "d", maxCategories = 1)
    }
  }

  test("clip/where/mask: bound snap, keep-vs-replace, nulls pass through") {
    val df = Seq(Some(5.0), Some(50.0), Some(95.0), None).toDF("v")
    val out = df.select(
        Frame.clip(col("v"), Some(10.0), Some(90.0)).as("c"),
        Frame.where(col("v"), col("v") >= 25.0, lit(null)).as("w"),
        Frame.mask(col("v"), col("v") > 50.0, lit(50.0)).as("m"))
      .collect().map(r => (optD(r, 0), optD(r, 1), optD(r, 2))).toSeq
    // pandas: clip(10,90)=[10,50,90,NaN]; where(v>=25)=[NaN,50,95,NaN];
    //         mask(v>50, 50)=[5,50,50,NaN]
    assert(out == Seq(
      (Some(10.0), None, Some(5.0)),
      (Some(50.0), Some(50.0), Some(50.0)),
      (Some(90.0), Some(95.0), Some(50.0)),
      (None, None, None)))
  }

  test("factorize: codes in first-appearance order, null -> -1") {
    val df = Seq((1L, "b"), (2L, "a"), (3L, "b"), (4L, null), (5L, "c"))
      .toDF("i", "v")
    val out = Frame.factorize(df, "v", "i", "code").orderBy("i")
      .collect().map(_.getLong(2)).toSeq
    // pandas factorize: b=0 (first seen), a=1, c=2, NaN=-1
    assert(out == Seq(0L, 1L, 0L, -1L, 2L))
  }

  test("stack/unstack round-trip: wide<->long, nulls dropped/restored") {
    val wide = Seq((1L, Some(2.0), None: Option[Double]),
      (2L, Some(3.0), Some(4.0))).toDF("k", "x", "y")
    val long = Frame.stack(wide, Seq("k"), Seq("x", "y"), "var", "val")
      .orderBy("k", "var")
    assert(long.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "x", 2.0), (2L, "x", 3.0), (2L, "y", 4.0)))
    val back = Frame.unstack(long, Seq("k"), "var", "val", Seq("x", "y"))
      .orderBy("k").collect()
    assert(optD(back(0), 1) == Some(2.0) && optD(back(0), 2).isEmpty)
    assert(optD(back(1), 1) == Some(3.0) && optD(back(1), 2) == Some(4.0))
  }

  test("between_time/at_time: inclusive time-of-day window, exact match") {
    val df = Seq("2024-01-01 08:59:59", "2024-01-01 09:00:00",
        "2024-01-02 12:00:00", "2024-01-03 17:00:01")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    assert(df.filter(Frame.betweenTime(col("ts"), "09:00:00", "17:00:00"))
      .count() == 2)
    assert(df.filter(Frame.atTime(col("ts"), "12:00:00")).count() == 1)
  }

  test("searchsorted: left counts <, right counts <=, unsorted input") {
    val df = Seq(3.0, 1.0, 2.0, 2.0).toDF("v")
    val out = Frame.searchsorted(df, "v", Seq(0.5, 2.0, 4.0))
      .orderBy("probe").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    // numpy searchsorted on sorted [1,2,2,3]: 0.5->(0,0), 2->(1,3), 4->(4,4)
    assert(out == Seq((0.5, 0L, 0L), (2.0, 1L, 3L), (4.0, 4L, 4L)))
  }

  test("row-wise rank (average ties) and idx extrema (first on ties)") {
    val df = Seq((1.0, 2.0, 2.0)).toDF("a", "b", "c")
    val cols = Seq("a", "b", "c")
    val out = df.select(
      Frame.rowRank(cols, "a"), Frame.rowRank(cols, "b"),
      Frame.rowRank(cols, "c"), Frame.idxmaxRow(cols),
      Frame.idxminRow(cols)).collect()(0)
    // pandas: [1,2,2].rank() = [1.0, 2.5, 2.5]; idxmax first-on-ties = b
    assert(out.getDouble(0) == 1.0)
    assert(out.getDouble(1) == 2.5 && out.getDouble(2) == 2.5)
    assert(out.getString(3) == "b" && out.getString(4) == "a")
  }

  test("rowCumsum/rowCummax vs pandas cumsum/cummax(axis=1) with NaN holes") {
    // pandas: df = {a:[1,nan,3], b:[nan,2,1], c:[2,4,nan]}
    //   cumsum(axis=1): a=[1,nan,3] b=[nan,2,4] c=[3,6,nan]
    //   cummax(axis=1): a=[1,nan,3] b=[nan,2,3] c=[2,4,nan]
    val df = Seq(
      (0L, Some(1.0), None: Option[Double], Some(2.0)),
      (1L, None: Option[Double], Some(2.0), Some(4.0)),
      (2L, Some(3.0), Some(1.0), None: Option[Double]))
      .toDF("i", "a", "b", "c")
    val cols = Seq(col("a"), col("b"), col("c"))
    val names = Seq("a", "b", "c")
    val out = df.select(Seq(col("i")) ++ Frame.rowCumsum(cols, names) ++
        Frame.rowCummax(cols, names): _*)
      .orderBy("i").collect()
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    assert(out.map(r => (d(r, 1), d(r, 2), d(r, 3))).toSeq == Seq(
      (Some(1.0), None, Some(3.0)),
      (None, Some(2.0), Some(6.0)),
      (Some(3.0), Some(4.0), None)))
    assert(out.map(r => (d(r, 4), d(r, 5), d(r, 6))).toSeq == Seq(
      (Some(1.0), None, Some(2.0)),
      (None, Some(2.0), Some(4.0)),
      (Some(3.0), Some(3.0), None)))
  }

  test("autocorr vs pandas: Series([1,3,2,5,4,6]).autocorr(1)=0.3, (3)=-0.5") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) }.toDF("g", "i", "v")
    val w = Window.partitionBy("g").orderBy("i")
    val out = Frame.autocorr(df, "v", w, Seq("g"), lags = Seq(1, 3))
      .collect().head
    assert(math.abs(out.getDouble(1) - 0.3) < 1e-12)
    assert(math.abs(out.getDouble(2) - (-0.5)) < 1e-12)
  }
}
