package graft

import org.apache.spark.sql.functions._
import graft.engine.Syntax._

/** The `.pp` accessor surface (SURVEY.md §2.13 — `.parallel` analogue). */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1.0, 10.0, "a"), (2.0, 20.0, "a"), (3.0, 60.0, "b"))
    .toDF("x", "y", "k")

  test("reductions over all numeric columns by default") {
    val m = df.pp.mean()
    assert(m.columns.toSeq == Seq("x_mean", "y_mean"))
    val r = m.collect()(0)
    assertApprox(optD(r, 0), Some(2.0))
    assertApprox(optD(r, 1), Some(30.0))
  }

  test("quantile / nunique / describe shapes") {
    assertApprox(d1(df.pp.quantile(0.5, "x")), Some(2.0))
    assert(df.pp.nunique("k").collect()(0).getLong(0) == 2L)
    assert(df.pp.describe("x").count() == 8)
  }

  test("groupby agg and transform through the accessor") {
    val a = df.pp.agg(Seq("k"), Seq("x" -> Seq("sum")))
    assert(a.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 3.0), ("b", 3.0)))
    val t = df.pp.transform("mean", "x", Seq("k"))
    assert(t.columns.contains("x_mean"))
    assert(t.filter(col("k") === "a").select("x_mean")
      .collect().forall(_.getDouble(0) == 1.5))
  }

  test("merge and applymap through the accessor") {
    val right = Seq(("a", 100.0)).toDF("k", "z")
    val m = df.pp.merge(right, on = Seq("k"), how = "left")
    assert(m.count() == 3)
    val am = df.pp.applymap(Seq("x"), c => c * 2)
    assert(colD(am.orderBy("x"), "x") == Seq(2.0, 4.0, 6.0).map(Some(_)))
  }

  test("round-4 surface: value_counts / aggregate / rank / describeBy / transformApply") {
    val vc = df.pp.valueCounts("k").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(vc.toSeq == Seq(("a", 2L), ("b", 1L)))
    val ag = df.pp.aggregate(Seq("sum", "max"), "x")
    assert(ag.columns.toSeq == Seq("stat", "x") && ag.count() == 2)
    val rk = df.pp.rank("x")
    assert(rk.columns.contains("rank"))
    val db = df.pp.describeBy(Seq("k"), "x")
    assert(db.columns.contains("x_p50") && db.count() == 2)
    val ta = df.pp.transformApply(Seq("k"), "x", "x", "t")(xs =>
      xs.map(_ * 10))
    assert(colD(ta.orderBy("x"), "t") == Seq(10.0, 20.0, 30.0).map(Some(_)))
  }

  test("round-5 surface: corrMatrix(method) / merge validate / bm25 / decontaminate") {
    val wide = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 1.0), (3.0, 5.0, 2.0))
      .toDF("a", "b", "c")
    val cm = wide.pp.corrMatrix("spearman", Seq("a", "b", "c"))
    assert(cm.columns.toSeq == Seq("c1", "c2", "spearman") && cm.count() == 3)
    intercept[IllegalArgumentException] {
      val dup = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "x")
      dup.pp.merge(dup, on = Seq("k"), validate = Some("1:1"))
    }
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("id", "t")
    assert(corpus.pp.bm25TopTerms("id", "t", k = 1).count() == 2)
    assert(corpus.pp.decontaminate(
      corpus.filter(col("id") === 1L), "id", "t", k = 1).count() == 2)
  }

  test("round-6 surface: fill / resample / reshape / positional") {
    val ev = Seq((1L, "u1", Some(1.0)), (2L, "u1", None), (3L, "u1", Some(3.0)))
      .toDF("i", "u", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("i")
    assert(ev.pp.ffill("v", w).where(col("v").isNull).count() == 0)
    assert(ev.pp.bfill("v", w, limit = Some(1)).where(col("v").isNull).count() == 0)
    assert(ev.pp.interpolate("v", w).collect()
      .map(r => r.getDouble(2)).sorted.toSeq == Seq(1.0, 2.0, 3.0))
    val ts = Seq((java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1.0))
      .toDF("ts", "v")
    assert(ts.pp.resample("ts", "M", Seq(("v", "sum"))).count() == 1)
    val wide = Seq((1L, 2.0, 3.0)).toDF("id", "a", "b")
    assert(wide.pp.melt(Seq("id"), Seq("a", "b")).count() == 2)
    assert(wide.pp.crosstab("id", "a").columns.length == 2)
    assert(ev.pp.dropDuplicates(Seq("u"), "i").count() == 1)
    assert(ev.pp.groupbyHead(Seq("u"), "i", 2).count() == 2)
    assert((1 to 8).map(_.toDouble).toDF("x").pp.qcut("x", 2, "c")
      .where(col("c") === 0).count() == 4)
  }

  test("round-6 surface: frame alignment / selection family") {
    val ev = Seq((1L, "u1", 1.0), (2L, "u1", 2.0), (3L, "u2", 9.0))
      .toDF("i", "u", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("i")
    assert(ev.pp.shift("v", 1, w).where(col("v_shift").isNotNull).count() == 1)
    assert(ev.pp.diff("v", 1, w).where(col("v_diff") === 1.0).count() == 1)
    assert(ev.pp.nlargest(1, "v", "i").collect()(0).getLong(0) == 3L)
    assert(ev.pp.nsmallest(1, "v", "i").collect()(0).getLong(0) == 1L)
    assert(ev.pp.groupbyFilter(Seq("u"), avg(col("v")), _ > 5.0).count() == 1)
    val other = Seq((1L, 2.0), (2L, 4.0), (3L, 18.0)).toDF("i", "y")
    assert(ev.pp.corrwith(other, Seq("i"), Seq("v" -> "y"))
      .collect()(0).getDouble(1) > 0.99)
    assert(ev.pp.combineFirst(other.withColumnRenamed("y", "v"), Seq("i"))
      .count() == 3)
    assert(ev.pp.concat(other.drop("y")).columns.toSeq ==
      Seq("i", "u", "v"))
    assert(Seq((1L, Seq("a", "b"))).toDF("i", "arr")
      .pp.explodeCol("arr", "t").count() == 2)
    assert(ev.pp.getDummies("u", "u").columns.count(_.startsWith("u_")) == 2)
  }

  test("round-8 surface: cov family / pageRank / linkage / bpe / semantic decontam") {
    import org.apache.spark.sql.expressions.Window
    val xy = Seq((1L, 0L, 1.0, 2.0), (1L, 1L, 2.0, 1.0), (1L, 2L, 4.0, 5.0),
      (1L, 3L, 3.0, 4.0)).toDF("g", "i", "x", "y")
    val w = Window.partitionBy("g").orderBy("i")
    assert(xy.pp.covMatrix("x", "y").count() == 3)       // xx, xy, yy
    assert(xy.pp.covMatrixBy("g", Seq("x", "y")).count() == 3)
    assert(xy.pp.corrMatrixBy("g", Seq("x", "y")).count() == 3)
    assert(xy.pp.rollingCov("x", "y", w, 2, 2).columns.contains("x_y_cov"))
    assert(xy.pp.ewmCorr("x", "y", w, 0.3).columns.contains("x_y_ewm_corr"))
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "t")
    val pr = edges.pp.pageRank("s", "t", iters = 2).collect()
    assert(pr.length == 3 && math.abs(pr.map(_.getDouble(1)).sum - 1.0) < 1e-12)
    val names = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz")).toDF("id", "t")
    assert(names.pp.editDistanceJoin("id", "t", 1).count() == 1)
    assert(names.pp.editDistanceJoinTables(names, "id", "t", "id", "t", 1)
      .count() >= 3)  // self-matches at dist 0 + the abc~abd pair
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val merges = docs.pp.bpeTrain("doc_id", "text", 2)
    assert(merges.count() == 2)
    val ms = merges.orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(docs.pp.bpeApply("doc_id", "text", ms).count() == 2)
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(vecs.pp.semanticDecontaminate(vecs.filter(col("vec_id") === 1), 0.9)
      .filter(col("contaminated")).count() == 1)
  }

  test("round-9 surface: mergeOn (index/asymmetric keys) + ewm times=") {
    import org.apache.spark.sql.expressions.Window
    val left = Seq((1L, "a"), (2L, "b")).toDF("row_id", "v")
    val right = Seq((1L, 10.0)).toDF("k", "x")
    val m = left.pp.mergeOn(right, Seq("row_id"), Seq("k"),
      how = "left", indicator = true)
    assert(m.columns.toSeq == Seq("row_id", "v", "k", "x", "_merge"))
    assert(m.filter(col("_merge") === "left_only").count() == 1)
    // validate= reaches GroupOps.mergeOn through the accessor
    intercept[IllegalArgumentException] {
      val dup = Seq((1L, 1.0), (1L, 2.0)).toDF("k", "x")
      left.pp.mergeOn(dup, Seq("row_id"), Seq("k"),
        validate = Some("1:1")).collect()
    }
    val ts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-08 00:00:00"), 3.0))
      .toDF("g", "t", "v")
    val w = Window.partitionBy("g").orderBy("t")
    val e = ts.pp.ewmMeanTimes("v", "t", w,
        halflifeMicros = 7.0 * 24 * 3600 * 1e6)
      .orderBy("t").collect().map(_.getDouble(3))
    // one halflife apart: (0.5*1 + 3) / 1.5 = 7/3
    assert(math.abs(e(0) - 1.0) < 1e-12)
    assert(math.abs(e(1) - 7.0 / 3) < 1e-9)
  }

  test("round-11 surface: chunkSliding / heavyHitters / quantizeInt8 " +
    "/ dequantizeInt8 through the accessor") {
    val docs = Seq((1L, Seq("a", "b", "c", "d", "e")))
      .toDF("doc_id", "toks")
    assert(docs.pp.chunkSliding("doc_id", "toks", 3, 2).count() == 3)
    val langs = Seq("en", "en", "fr").toDF("lang")
    val hh = langs.pp.heavyHitters("lang", 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(hh == Seq("en" -> 2L, "fr" -> 1L))
    val vecs = Seq((1L, Array(2.0, -1.0))).toDF("vec_id", "embedding")
    val q = vecs.pp.quantizeInt8()
    // floor(-63.5 + 0.5) = -63: the +0.5 shift rounds half-cases UP
    assert(q.collect()(0).getSeq[Byte](2) == Seq[Byte](127, -63))
    val back = q.pp.dequantizeInt8().collect()(0).getSeq[Double](1)
    assert(math.abs(back(0) - 2.0) < 1e-12 &&
      math.abs(back(1) + (63.0 * 2 / 127)) < 1e-12)
  }

  test("round-12 surface: minhashLshEdges / ngramShingleEdges through " +
    "the accessor") {
    val dup = (1L to 4L).map(i => (i, "same text body for every doc"))
      .toDF("doc_id", "text")
    // 4 identical docs: the edge SET is iterator-order-dependent, so
    // pin only what the mode guarantees — a spanning (connected) graph
    // far below the 6-pair full enumeration per group
    for (edges <- Seq(dup.pp.minhashLshEdges("doc_id", "text"),
                      dup.pp.ngramShingleEdges("doc_id", "text"))) {
      val comps = graft.pipeline.Dedup.clusters(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((1L to 4L).forall(comps(_) == 1L))
    }
  }

  test("round-14 surface: checkpointDir threads through dedupFuzzy / " +
    "dedupClusters (reliable-checkpoint protocol, identical output)") {
    val dup = (1L to 4L).map(i => (i, "same text body for every doc"))
      .toDF("doc_id", "text")
    val local = dup.pp.dedupFuzzy("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    val ckpt = dup.pp.dedupFuzzy("doc_id", "text",
        checkpointDir = Some("target/test-ckpt"))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(local == ckpt)
    assert(ckpt.count(_._2) == 1) // one survivor among 4 identical docs
    val comps = dup.pp.dedupClusters("doc_id", "text",
        checkpointDir = Some("target/test-ckpt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(comps(_) == 1L))
  }
}
