package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** pandas `df.resample(freq, on=ts).agg(...)` — calendar-bucket
  * downsampling (`tests` exercise it through the reference's proxy;
  * the op itself is pandas core).
  *
  * Scale shape: ONE map-side-combinable hash aggregate on the period
  * label — the corpus shuffles once, keyed by O(#buckets) distinct
  * values. Gap filling joins the aggregate against a generated
  * calendar spine: both sides are bucket-sized (a 50-year span is
  * ~18k daily buckets), so the join is a broadcast of tiny frames and
  * the corpus is never touched again. The spine derives from a 1-row
  * min/max aggregate — for sub-minute freqs over decade spans, size
  * the bucket count accordingly (explode of one array row).
  *
  * Empty-bucket semantics follow pandas: `count` → 0, `sum` → 0 (of
  * the aggregate's own type), everything else (mean/min/max/std/var)
  * → null. Period labels are [[StrDt.dtToPeriod]]'s renderings (plus
  * "H"/"min"), so the output is rerun-stable and join-able on a plain
  * string key. */
object Resample {

  /** Period label of the bucket containing `c` for `freq`. */
  def label(c: Column, freq: String): Column = freq match {
    case "H" => date_format(date_trunc("hour", c), "yyyy-MM-dd HH:00")
    case "min" | "T" => date_format(date_trunc("minute", c), "yyyy-MM-dd HH:mm")
    case f => StrDt.dtToPeriod(c, f)
  }

  private def aggExpr(c: String, fn: String): Column = (fn match {
    case "sum" => sum(col(c))
    case "mean" => avg(col(c))
    case "min" => min(col(c))
    case "max" => max(col(c))
    case "count" => count(col(c))
    case "std" => stddev_samp(col(c))
    case "var" => var_samp(col(c))
    case other =>
      throw new IllegalArgumentException(s"resample agg: unsupported fn '$other'")
  }).as(s"${c}_$fn")

  /** One calendar-bucket spine timestamp per period between `mn` and
    * `mx` inclusive (start-of-period anchors; the label function maps
    * them to the same keys the data aggregates under). */
  private def spineSeq(mn: Column, mx: Column, freq: String): Column = freq match {
    case "Y" | "A" => sequence(to_date(date_trunc("year", mn)),
      to_date(mx), expr("INTERVAL 1 YEAR"))
    case "Q" => sequence(to_date(date_trunc("quarter", mn)),
      to_date(mx), expr("INTERVAL 3 MONTH"))
    case "M" => sequence(to_date(date_trunc("month", mn)),
      to_date(mx), expr("INTERVAL 1 MONTH"))
    case "W" => sequence(date_sub(to_date(mn), StrDt.dtDayOfWeek(mn)),
      to_date(mx), expr("INTERVAL 7 DAY"))
    case "D" => sequence(to_date(mn), to_date(mx), expr("INTERVAL 1 DAY"))
    case "H" => sequence(date_trunc("hour", mn), date_trunc("hour", mx),
      expr("INTERVAL 1 HOUR"))
    case "min" | "T" => sequence(date_trunc("minute", mn),
      date_trunc("minute", mx), expr("INTERVAL 1 MINUTE"))
    case other =>
      throw new IllegalArgumentException(s"resample: unsupported freq '$other'")
  }

  /** Downsample: bucket rows by the period containing `ts`, apply the
    * (column, fn) agg spec, one output row per period (every period
    * between min and max when `fillGaps`), sorted by period. */
  def resampleAgg(df: DataFrame, ts: String, freq: String,
                  aggs: Seq[(String, String)],
                  fillGaps: Boolean = true): DataFrame = {
    require(aggs.nonEmpty, "resample: need at least one (col, fn)")
    val exprs = aggs.map { case (c, f) => aggExpr(c, f) }
    val bucketed = df.groupBy(label(col(ts), freq).as("period"))
      .agg(exprs.head, exprs.tail: _*)
    if (!fillGaps) bucketed.orderBy("period")
    else {
      val mm = df.agg(min(col(ts)).as("__mn"), max(col(ts)).as("__mx"))
      val spine = mm
        .select(explode(spineSeq(col("__mn"), col("__mx"), freq)).as("__t"))
        .select(label(col("__t"), freq).as("period"))
      val outCols = col("period") +: aggs.map { case (c, f) =>
        val name = s"${c}_$f"
        f match {
          case "count" => coalesce(col(name), lit(0L)).as(name)
          case "sum" =>
            coalesce(col(name),
              lit(0).cast(bucketed.schema(name).dataType)).as(name)
          case _ => col(name)
        }
      }
      spine.join(broadcast(bucketed), Seq("period"), "left")
        .select(outCols: _*)
        .orderBy("period")
    }
  }
}
