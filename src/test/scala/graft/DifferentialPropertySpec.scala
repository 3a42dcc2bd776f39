package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ewm, Joins}

/** Seeded randomized differential tests for the two operator families
  * whose correctness rests on the most intricate bookkeeping:
  *   - EWM: the mergeable Aggregator (partial-combine decay by right
  *     count) against the O(n²) closed-form pandas definition;
  *   - as-of join: the union+window formulation against a brute-force
  *     per-row scan, across direction / tolerance / exact-match flags.
  * Fixed seed → deterministic suite. */
class DifferentialPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def draw[A](gen: Gen[A], seed: Seed): (A, Seed) =
    (gen.pureApply(Gen.Parameters.default, seed), seed.next)

  // ---- EWM mean/var, adjust=True (the engine's mode): closed form
  // over positions of non-null values
  private def refEwmMean(xs: Seq[Option[Double]], a: Double): Seq[Option[Double]] =
    xs.indices.map { i =>
      val seen = xs.take(i + 1).zipWithIndex
        .collect { case (Some(v), j) => (v, i - j) } // (value, distance)
      if (seen.isEmpty) None
      else {
        val w = seen.map { case (_, d) => math.pow(1 - a, d) }
        Some(seen.map(_._1).zip(w).map { case (v, wt) => v * wt }.sum / w.sum)
      }
    }

  test("EWM aggregator equals the closed-form pandas definition (random)") {
    var seed = Seed(7L)
    for (_ <- 1 to 12) {
      val gen = for {
        n <- Gen.choose(1, 40)
        a <- Gen.choose(0.05, 0.95)
        xs <- Gen.listOfN(n, Gen.option(Gen.choose(-5, 5).map(_.toDouble)))
      } yield (a, xs)
      val ((a, xs), s2) = draw(gen, seed); seed = s2
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("i", "v")
      val w = Window.partitionBy(lit(1)).orderBy("i")
      val got = df.select(col("i"), Ewm.mean(col("v"), w, a).as("m"))
        .orderBy("i").collect()
        .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      val want = refEwmMean(xs, a)
      got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
        (g, e) match {
          case (None, None) =>
          case (Some(x), Some(y)) =>
            assert(math.abs(x - y) <= 1e-9, s"pos $i: got $x want $y (a=$a, xs=$xs)")
          case _ => fail(s"pos $i: got $g want $e (a=$a, xs=$xs)")
        }
      }
    }
  }

  // ---- as-of join vs brute force
  private def refAsof(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long, Double)],
                      dir: String, tolUs: Option[Long], exact: Boolean): Map[(Long, Long), Option[Double]] =
    lefts.map { case (key, t) =>
      val cand = rights.filter(_._1 == key).filter { case (_, rt, _) =>
        val d = rt - t
        val inDir = dir match {
          case "backward" => if (exact) d <= 0 else d < 0
          case "forward" => if (exact) d >= 0 else d > 0
          case "nearest" => exact || d != 0
        }
        inDir && tolUs.forall(tl => math.abs(d) <= tl)
      }
      val best = dir match {
        case "backward" => cand.sortBy(c => -c._2).headOption
        case "forward" => cand.sortBy(c => c._2).headOption
        case "nearest" =>
          // pandas nearest: smallest |distance|, backward wins ties
          cand.sortBy(c => (math.abs(c._2 - t), c._2 - t)).headOption
      }
      (key, t) -> best.map(_._3)
    }.toMap

  test("as-of join equals brute force across directions/tolerance/exact (random)") {
    var seed = Seed(11L)
    for (round <- 1 to 10) {
      val gen = for {
        nl <- Gen.choose(1, 25)
        nr <- Gen.choose(0, 25)
        // coarse time grid -> guaranteed exact-match collisions
        lt <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 20L)))
        rt <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 20L)))
        dir <- Gen.oneOf("backward", "forward", "nearest")
        tol <- Gen.option(Gen.choose(1L, 8L))
        exact <- Gen.oneOf(true, false)
      } yield (lt, rt.distinct, dir, tol, exact)
      val ((lt0, rt, dir, tol, exact), s2) = draw(gen, seed); seed = s2
      val lt = lt0.distinct
      // on must be unique per (by, side): distinct (key, t) pairs
      val lefts = lt.map { case (k, t) => (k, t * 1000000L) }
      val rights = rt.map { case (k, t) => (k, t * 1000000L, (k * 100 + t).toDouble) }
      val ldf = lefts.map { case (k, t) => (k, new Timestamp(t / 1000)) }
        .toDF("k", "ts")
      val rdf = rights.map { case (k, t, v) => (k, new Timestamp(t / 1000), v) }
        .toDF("k", "ts", "v")
      val d = dir match {
        case "backward" => Joins.Backward
        case "forward" => Joins.Forward
        case "nearest" => Joins.Nearest
      }
      val got = Joins.asof(ldf, rdf, "ts", Seq("k"), d, tol.map(_ * 1000000L), exact)
        .select(col("k"), unix_micros(col("ts").cast("timestamp")).as("t"), col("v"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      val want = refAsof(lefts, rights, dir, tol.map(_ * 1000000L), exact)
      assert(got.keySet == want.keySet,
        s"round $round: key sets differ (dir=$dir tol=$tol exact=$exact)")
      for ((k, w) <- want)
        assert(got(k) == w,
          s"round $round: $k got ${got(k)} want $w (dir=$dir tol=$tol " +
            s"exact=$exact,\n lefts=$lefts\n rights=$rights)")
    }
  }

  // ---- quantilesBySort (the sort-based exact quantile probe behind
  // qcut's pandas-parity path since r10): random frames with
  // null/NaN holes against the in-memory pandas linear-interpolation
  // definition
  test("quantilesBySort equals in-memory linear interpolation (random)") {
    def ref(xs: Seq[Double], q: Double): Double = {
      val a = xs.sorted
      val p = (a.length - 1) * q
      val lo = math.floor(p).toInt; val hi = math.ceil(p).toInt
      a(lo) + (p - math.floor(p)) * (a(hi) - a(lo))
    }
    val gen = for {
      n <- Gen.choose(1, 60)
      xs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.choose(-100.0, 100.0).map(Option(_)),
        1 -> Gen.const(Option(Double.NaN)),
        1 -> Gen.const(Option.empty[Double])))
      qs <- Gen.someOf(Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0))
        .suchThat(_.nonEmpty)
    } yield (xs, qs.toSeq)
    var seed = Seed(20260814L)
    for (round <- 1 to 25) {
      val ((xs, qs), s2) = draw(gen, seed); seed = s2
      val finite = xs.flatten.filterNot(_.isNaN)
      val df = xs.toDF("v")
      val got = graft.engine.Reductions.quantilesBySort(df, "v", qs)
      if (finite.isEmpty) got.foreach(g => assert(g.isNaN, s"round $round"))
      else qs.zip(got).foreach { case (q, g) =>
        val w = ref(finite, q)
        assert(math.abs(g - w) < 1e-12 * math.max(1, math.abs(w)),
          s"round $round: q=$q got $g want $w (n=${finite.size})")
      }
    }
  }

  // ---- TextWrapKernel: structural invariants over random token
  // streams (the CPython-generated value differentials live in
  // StrDtSpec; this guards the greedy fold's bookkeeping at widths
  // and token shapes those cases don't reach)
  test("textwrap kernel invariants on 200 random inputs (seeded)") {
    val gen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n,
        Gen.choose(1, 9).flatMap(l =>
          Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString)))
      width <- Gen.choose(1, 12)
      pad <- Gen.oneOf(" ", "  ", "\t", " \n ")
    } yield (toks, width, pad)
    var seed = Seed(2026_08_14L)
    for (round <- 1 to 200) {
      val ((toks, width, pad), s2) = draw(gen, seed); seed = s2
      val text = toks.mkString(pad)
      val out = graft.functions.TextWrapKernel.wrap(text, width)
      val lines = if (out.isEmpty) Seq.empty else out.split("\n", -1).toSeq
      // 1. no line exceeds the width
      lines.foreach(l => assert(l.length <= width,
        s"round $round: line '$l' > width $width (text='$text')"))
      // 2. no line is empty (no token is lost into a blank line)
      lines.foreach(l => assert(l.nonEmpty,
        s"round $round: blank line in '$out' (text='$text')"))
      // 3. dropping all whitespace reproduces the input's non-space
      //    characters in order (nothing lost, nothing duplicated)
      assert(out.replaceAll("[\\s]", "") == text.replaceAll("[\\s]", ""),
        s"round $round: characters lost/added (text='$text', out='$out')")
      // 4. every line break is "justified": gluing a line's first
      //    chunk onto the previous line would overflow the width
      //    (greedy = no premature break), EXCEPT after a sliced long
      //    word, where the previous line is exactly full
      lines.sliding(2).foreach {
        case Seq(prev, next) =>
          val firstChunk = next.takeWhile(_ != ' ')
          assert(prev.length + 1 + firstChunk.length > width ||
            prev.length == width,
            s"round $round: premature break between '$prev' and " +
              s"'$next' at width $width (text='$text')")
        case _ =>
      }
    }
  }
}
