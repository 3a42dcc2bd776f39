package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** pandas fill family — ffill / bfill / fillna / interpolate
  * (`df.ffill()`, `df.bfill()`, `df.interpolate(method='linear')`;
  * any-method proxies in the reference ride `p_apply`,
  * `/root/reference/parallel_pandas/core/parallel_dataframe.py`).
  *
  * Scale shape: every op here is a window computation over the
  * caller's (partition, order) spec — ONE shuffle on the partition
  * key, and with `limit=` the frame is BOUNDED (n+1 trailing/leading
  * rows), so per-task state is O(limit) regardless of run length.
  * Unlimited fills keep the running `last(ignoreNulls)` accumulator —
  * O(1) state, but note the global-ordering caveat on
  * [[Cumulative.globalCumsum]] applies if the window is unpartitioned.
  * [[interpolate]] needs a row index, which cannot nest inside
  * another window expression, so it is DataFrame-level: two stacked
  * selects that Catalyst plans as consecutive Window operators over
  * the SAME exchange — still one shuffle. */
object Fill {

  /** pandas ffill(limit=): last non-null at or before the current row,
    * looking back at most `limit` rows. */
  def ffill(c: Column, w: WindowSpec, limit: Option[Int] = None): Column = {
    val frame = limit match {
      case Some(n) => w.rowsBetween(-n.toLong, Window.currentRow)
      case None => w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    last(c, ignoreNulls = true).over(frame)
  }

  /** pandas bfill(limit=): first non-null at or after the current row,
    * looking ahead at most `limit` rows. */
  def bfill(c: Column, w: WindowSpec, limit: Option[Int] = None): Column = {
    val frame = limit match {
      case Some(n) => w.rowsBetween(Window.currentRow, n.toLong)
      case None => w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    }
    first(c, ignoreNulls = true).over(frame)
  }

  /** pandas interpolate(method='linear', limit_direction='forward') on
    * one column: nulls between two valid values get the straight-line
    * value at their ROW position (pandas' default index-free 'linear',
    * which interpolates on position, not on a time index); trailing
    * nulls extend the last valid value (pandas pads them); leading
    * nulls stay null. Emits the frame plus `out`. */
  def interpolate(df: DataFrame, c: String, out: String,
                  w: WindowSpec): DataFrame = {
    val v = col(c).cast("double")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val s1 = df.withColumn("__rn", row_number().over(w))
    val s2 = s1
      .withColumn("__pv", last(v, ignoreNulls = true).over(wCum))
      .withColumn("__pi",
        last(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(wCum))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wFwd))
      .withColumn("__ni",
        first(when(v.isNotNull, col("__rn")), ignoreNulls = true).over(wFwd))
    s2.withColumn(out,
        when(v.isNotNull, v)
          .when(col("__pv").isNull, lit(null))
          .when(col("__nv").isNull, col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (col("__rn") - col("__pi")) / (col("__ni") - col("__pi"))))
      .drop("__rn", "__pv", "__pi", "__nv", "__ni")
  }
}
