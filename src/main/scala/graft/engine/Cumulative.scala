package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Cumulative / order-sensitive per-row ops: cumsum, cummin, cummax,
  * cumprod, pct_change.
  *
  * Reference: `ParallelizeAccumFunc` (`/root/reference/parallel_pandas/
  * core/parallel_dataframe.py:864-916`) and latent `p_pct_change`
  * (`:465-489`). pandas semantics: NaN cells stay NaN in the output and
  * are skipped by the accumulation (skipna=True default).
  *
  * Scale note: a global `Window.orderBy(idx)` with no partitionBy
  * serializes into one task. Callers at cluster scale should pass a
  * partitioned window (`Window.partitionBy(group).orderBy(idx)`) — all
  * of the engine's own grouped queries do. A truly global running sum at
  * 100 TB needs the two-pass range-partitioned prefix-sum: sort, per-
  * partition partials, broadcast the partition prefix offsets, add. The
  * unit of work the reference supports (per-group cumulatives) never
  * needs it.
  */
object Cumulative {

  private def running(w: WindowSpec) =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** NaN/null passthrough: pandas keeps the cell NaN but continues the
    * accumulation across it; Spark window aggs already skip nulls, we just
    * re-null the output cell where the input was null. */
  private def keepNull(c: Column, out: Column): Column =
    when(c.isNull, lit(null)).otherwise(out)

  def cumsum(c: Column, w: WindowSpec): Column = keepNull(c, sum(c).over(running(w)))
  def cummin(c: Column, w: WindowSpec): Column = keepNull(c, min(c).over(running(w)))
  def cummax(c: Column, w: WindowSpec): Column = keepNull(c, max(c).over(running(w)))

  /** cumprod via the product Aggregator as a running window function
    * (exact, handles zeros/negatives; WindowExec evaluates the growing
    * frame incrementally, O(n) per partition). */
  def cumprod(c: Column, w: WindowSpec): Column =
    keepNull(c, udaf(Reductions.productAgg).apply(c).over(running(w)))

  /** pct_change(periods, fill_method='pad'): forward-fill then lag.
    * `x/lag(x) - 1` over the given ordering. */
  def pctChange(c: Column, w: WindowSpec, periods: Int = 1,
                fillMethod: Option[String] = Some("pad")): Column = {
    val filled = fillMethod match {
      case Some("pad") =>
        last(c, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case _ => c
    }
    filled / lag(filled, periods).over(w) - 1
  }
}
