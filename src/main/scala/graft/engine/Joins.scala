package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as builtins: as-of (pandas `merge_asof`)
  * and point-in-interval range join.
  *
  * Both are implemented without a range-predicate join (which Spark
  * executes as BroadcastNestedLoop or a full sort-merge with per-row
  * rescans):
  *
  *   - as-of: UNION the two sides, one window pass per direction carrying
  *     the last/next right-side row forward — ONE shuffle keyed by the
  *     `by` columns, O(n log n) in partition size, no pair explosion.
  *     This is the classic distributed formulation (a sort-merge zip).
  *   - range join: quantize intervals into fixed-width buckets and
  *     equi-join on (key, bucket) — the band-join trick; each interval
  *     lands in ceil(len/width)+1 buckets so the join is hash-partitioned
  *     and prunable instead of quadratic.
  */
object Joins {

  sealed trait AsofDirection
  case object Backward extends AsofDirection
  case object Forward extends AsofDirection
  case object Nearest extends AsofDirection

  /** pandas `merge_asof(left, right, on, by, direction, tolerance,
    * allow_exact_matches)`.
    *
    * For each left row, attaches the right row whose `on` value is the
    * closest at-or-before (backward), at-or-after (forward), or nearest
    * in either direction — within the same `by` key group and an optional
    * `toleranceUs` (microseconds, `on` must be a timestamp).
    * Right columns other than `on`/`by` are appended, suffixed `_y` on a
    * name clash (pandas' right-suffix default). `on` must be unique per
    * (by, side) for a well-defined match — same precondition as pandas.
    *
    * Scale shape: one shuffle (window partitionBy `by`); the union never
    * widens rows beyond left ∪ right columns; no join node at all.
    */
  def asof(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
           direction: AsofDirection = Backward,
           toleranceUs: Option[Long] = None,
           allowExactMatches: Boolean = true): DataFrame = {
    val valueCols = right.columns.filterNot(c => c == on || by.contains(c))
    val outName: Map[String, String] =
      valueCols.map(c => c -> (if (left.columns.contains(c)) c + "_y" else c)).toMap

    // align the two sides onto one schema: left columns ++ right value
    // columns (null on the other side) ++ side tag
    val lAligned = left
      .select(left.columns.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(outName(c))) :+
        lit(1).as("__side"): _*)
    val rAligned = right
      .select(left.columns.map(c =>
        if (c == on || by.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(outName(c))) :+
        lit(0).as("__side"): _*)
    val unioned = lAligned.unionByName(rAligned)

    val ts = Core.usOf(col(on))
    // at equal `on`, the right row (side 0) must precede the left row in
    // the scan order iff exact matches are allowed — true for both time
    // directions, since "precede" is about the running frame, not time
    val sideOrder = if (allowExactMatches) col("__side").asc else col("__side").desc

    def carried(desc: Boolean): (Seq[Column], Column) = {
      val w0 = Window.partitionBy(by.map(col): _*)
        .orderBy(if (desc) ts.desc else ts.asc, sideOrder)
      val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mts = last(when(col("__side") === 0, ts), ignoreNulls = true).over(w)
      val vals = valueCols.map(c =>
        last(when(col("__side") === 0, col(outName(c))), ignoreNulls = true).over(w))
      (vals, mts)
    }

    def gate(vals: Seq[Column], mts: Column, dist: Column): (Seq[Column], Column) =
      toleranceUs match {
        case Some(tol) =>
          val ok = dist <= tol
          (vals.map(v => when(ok, v)), when(ok, mts))
        case None => (vals, mts)
      }

    val result = direction match {
      case Backward =>
        val (vals, mts) = carried(desc = false)
        val (gv, _) = gate(vals, mts, ts - mts)
        unioned.select(left.columns.map(col) ++
          valueCols.zip(gv).map { case (c, v) => v.as(outName(c)) } :+
          col("__side"): _*)
      case Forward =>
        val (vals, mts) = carried(desc = true)
        val (gv, _) = gate(vals, mts, mts - ts)
        unioned.select(left.columns.map(col) ++
          valueCols.zip(gv).map { case (c, v) => v.as(outName(c)) } :+
          col("__side"): _*)
      case Nearest =>
        val (bVals, bTs) = carried(desc = false)
        val (fVals, fTs) = carried(desc = true)
        val (gbV, gbT) = gate(bVals, bTs, ts - bTs)
        val (gfV, gfT) = gate(fVals, fTs, fTs - ts)
        // ties go backward (pandas nearest semantics)
        val pickB = gfT.isNull || (gbT.isNotNull && (ts - gbT) <= (gfT - ts))
        unioned.select(left.columns.map(col) ++
          valueCols.indices.map(i =>
            when(pickB, gbV(i)).otherwise(gfV(i)).as(outName(valueCols(i)))) :+
          col("__side"): _*)
    }
    result.filter(col("__side") === 1).drop("__side")
  }

  /** Point-in-interval range join: left rows carry an interval
    * [`lo`, `hi`] (inclusive), right rows a point `pt`; emits every
    * (left, right) pair with the same `by` key and lo <= pt <= hi.
    *
    * Executed as an equi-join on (by, bucket) with `bucketUs`-wide
    * time buckets: each interval explodes into the buckets it covers,
    * each point into exactly one. A plain `l.join(r, pt between lo/hi)`
    * would be a nested-loop; this shape is hash-partitioned, broadcast-
    * able, and AQE-skew-splittable. Choose `bucketUs` near the typical
    * interval length: shorter buckets = more interval duplicates, longer
    * buckets = more filtered-out candidates.
    */
  def rangeJoin(left: DataFrame, lo: Column, hi: Column,
                right: DataFrame, pt: Column, by: Seq[String],
                bucketUs: Long): DataFrame = {
    // integer DIV, not floor(x / y): the double division loses exactness
    // for epoch-micros magnitudes near 2^53 (post-2255 timestamps, or
    // sub-microsecond clocks)
    val l = left
      .withColumn("__lo", Core.usOf(lo))
      .withColumn("__hi", Core.usOf(hi))
      .withColumn("__b",
        explode(sequence(expr(s"__lo DIV $bucketUs"), expr(s"__hi DIV $bucketUs"))))
    val r = right
      .withColumn("__pt", Core.usOf(pt))
      .withColumn("__b", expr(s"__pt DIV $bucketUs"))
    l.join(r, by :+ "__b")
      .filter(col("__pt") >= col("__lo") && col("__pt") <= col("__hi"))
      .drop("__lo", "__hi", "__pt", "__b")
  }
}
