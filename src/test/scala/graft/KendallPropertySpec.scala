package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Corr

/** Property test: the distributed grid-decomposition Kendall equals the
  * O(n²) pairwise definition on arbitrary tie-heavy data and bucket
  * counts — randomized evidence on top of GroupCorrSpec's fixed
  * vectors, because the bucket-boundary bookkeeping (classes 1/2/3
  * partition of the pair space) is exactly the kind of logic a fixed
  * example can miss. Cases are drawn from a FIXED seed so the suite is
  * deterministic. */
class KendallPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** O(n²) reference tau-b straight from the definition. */
  private def refTau(xs: Seq[Double], ys: Seq[Double]): Option[Double] = {
    val n = xs.length
    var cd = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- 0 until n; j <- (i + 1) until n) {
      n0 += 1
      val sx = math.signum(xs(j) - xs(i)); val sy = math.signum(ys(j) - ys(i))
      cd += (sx * sy).toLong
      if (xs(i) == xs(j)) tx += 1
      if (ys(i) == ys(j)) ty += 1
    }
    val denom = math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    if (denom == 0) None else Some(cd / denom)
  }

  test("kendallDistributed == pairwise definition on random tie-heavy data") {
    // few distinct values -> dense ties AND cut points landing exactly
    // on tied values; sizes around the bucket count stress empty and
    // single-row stripes
    val gen = for {
      n <- Gen.choose(2, 60)
      xs <- Gen.listOfN(n, Gen.choose(-3, 3).map(_.toDouble))
      ys <- Gen.listOfN(n, Gen.choose(0, 4).map(_.toDouble))
      b <- Gen.oneOf(2, 3, 5, 16)
    } yield (xs, ys, b)
    var seed = Seed(42L)
    for (_ <- 1 to 30) {
      val (xs, ys, b) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = xs.zip(ys).toDF("x", "y")
      val got = Corr.kendallDistributed(df, "x", "y", buckets = b)
        .collect()(0)
      val gotOpt = if (got.isNullAt(0)) None else Some(got.getDouble(0))
      (refTau(xs, ys), gotOpt) match {
        case (None, None) =>
        case (Some(w), Some(g)) => assert(math.abs(g - w) <= 1e-12,
          s"want $w got $g (n=${xs.length}, b=$b, xs=$xs, ys=$ys)")
        case (w, g) => fail(s"want $w got $g (n=${xs.length}, b=$b)")
      }
    }
  }
}
