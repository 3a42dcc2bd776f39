package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine._
import graft.engine.Core.r

/** Ninth tranche (round 8): the pairwise-covariance family the
  * reference's generic window proxy exposes (`parallel_window.py:38-40`
  * resolves ANY pandas rolling/ewm method name, so `rolling.cov`,
  * `rolling.corr`, `ewm.cov`, `ewm.corr` and `DataFrame.cov` are all
  * reachable surface) — previously implemented in the engine
  * ([[graft.engine.WindowOps.rCov]], [[graft.engine.Corr.covLong]]) but
  * not oracle-gated, plus the new pairwise EWM aggregators
  * ([[graft.engine.Ewm.covAgg]]). Same conventions as [[Queries]]. */
object Queries9 {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Core.normalizeTs(s.read.parquet(s"$dir/$name.parquet"))

  private val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
  private val evWin = "PARTITION BY user_id ORDER BY ts, event_id"

  // second series for the pairwise ops: a deterministic per-row rescale
  // of `value` — varying multiplier keeps corr strictly inside (0, 1)
  private val yExpr = "value * (event_id % 5 + 1)"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.9 rolling.cov / rolling.corr / expanding.cov: builtin
    //      covar_samp/corr as frame aggregates — one window shuffle for
    //      all three, WholeStageCodegen'd co-moment updates, pairwise
    //      min_periods gates ----
    "q_rolling_covcorr" -> ((s, d) => {
      val w10 = WindowOps.rollingSpec(byUser, 10)
      val we = WindowOps.expandingSpec(byUser)
      T(s, d, "events")
        .withColumn("y", expr(yExpr))
        .select(col("event_id"), col("user_id"),
          r(WindowOps.rCov(col("value"), col("y"), w10, 10), 2)
            .as("roll_cov"),
          r(WindowOps.rCorr(col("value"), col("y"), w10, 10), 4)
            .as("roll_corr"),
          r(WindowOps.rCov(col("value"), col("y"), we, 2), 2)
            .as("exp_cov"))
        .orderBy("user_id", "event_id")
    }),

    // ---- DataFrame.cov matrix (upper triangle + variance diagonal):
    //      ONE aggregate pass, all co-moments map-side combinable ----
    "q_cov_matrix" -> ((s, d) => {
      Corr.covLong(T(s, d, "lineitem"),
          Seq("l_quantity", "l_discount", "l_tax"))
        .select(col("c1"), col("c2"), r(col("cov"), 6).as("cov"))
        .orderBy("c1", "c2")
    }),

    // ---- §2.9 ewm.cov / ewm.corr (adjust=True, bias=False):
    //      mergeable pairwise Aggregators as running window fns ----
    "q_ewm_cov" -> ((s, d) => {
      T(s, d, "events")
        .withColumn("y", expr(yExpr))
        .select(col("event_id"), col("user_id"),
          // scale 2 / 4: same oracle closed-form pow-sum error budget
          // as q_ewm (ewm_var at 2); corr is O(1) so 4 holds
          r(Ewm.cov(col("value"), col("y"), byUser, 0.2), 2).as("ewm_cov"),
          r(Ewm.corr(col("value"), col("y"), byUser, 0.2), 4)
            .as("ewm_corr"))
        .orderBy("user_id", "event_id")
    }))

  val oracle: Map[String, String] = Map(

    "q_rolling_covcorr" ->
      s"""WITH o AS (SELECT event_id, ts, user_id, value,
           value * (event_id % 5 + 1) AS y FROM events)
         SELECT event_id, user_id,
           round(CASE WHEN count(*) OVER w10 >= 10
             THEN covar_samp(value, y) OVER w10 END + 1e-9, 2) AS roll_cov,
           round(CASE WHEN count(*) OVER w10 >= 10
             THEN corr(value, y) OVER w10 END + 1e-9, 4) AS roll_corr,
           round(CASE WHEN count(*) OVER we >= 2
             THEN covar_samp(value, y) OVER we END + 1e-9, 2) AS exp_cov
         FROM o WINDOW
           w10 AS ($evWin ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
           we AS ($evWin ROWS UNBOUNDED PRECEDING)
         ORDER BY user_id, event_id""",

    "q_cov_matrix" ->
      """SELECT c1, c2, round(cov + 1e-9, 6) AS cov FROM (
           SELECT 'l_quantity' AS c1, 'l_quantity' AS c2,
                  covar_samp(l_quantity, l_quantity) AS cov FROM lineitem
           UNION ALL
           SELECT 'l_quantity', 'l_discount',
                  covar_samp(l_quantity, l_discount) FROM lineitem
           UNION ALL
           SELECT 'l_quantity', 'l_tax',
                  covar_samp(l_quantity, l_tax) FROM lineitem
           UNION ALL
           SELECT 'l_discount', 'l_discount',
                  covar_samp(l_discount, l_discount) FROM lineitem
           UNION ALL
           SELECT 'l_discount', 'l_tax',
                  covar_samp(l_discount, l_tax) FROM lineitem
           UNION ALL
           SELECT 'l_tax', 'l_tax',
                  covar_samp(l_tax, l_tax) FROM lineitem)
         ORDER BY c1, c2""",

    // same analytic-weight-sum construction as q_ewm (valid because
    // events.value has no NULL/NaN so the decay clock == row_number);
    // the debias factor swc^2/(swc^2 - sw2c) cancels out of corr
    "q_ewm_cov" ->
      """WITH o AS (SELECT event_id, user_id, value,
           value * (event_id % 5 + 1) AS y,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         c AS (SELECT event_id, user_id, rn,
           sum(value * pow(0.8, -rn)) OVER w AS sx,
           sum(y * pow(0.8, -rn)) OVER w AS sy,
           sum(value * y * pow(0.8, -rn)) OVER w AS sxy,
           sum(value * value * pow(0.8, -rn)) OVER w AS sxx,
           sum(y * y * pow(0.8, -rn)) OVER w AS syy,
           sum(pow(0.8, -rn)) OVER w AS sw,
           (1 - pow(0.8, rn)) / 0.2 AS swc,
           (1 - pow(0.64, rn)) / 0.36 AS sw2c
           FROM o WINDOW w AS (PARTITION BY user_id ORDER BY rn
                               ROWS UNBOUNDED PRECEDING))
         SELECT event_id, user_id,
           round(CASE WHEN rn >= 2 THEN
             (sxy/sw - (sx/sw)*(sy/sw)) * (swc*swc/(swc*swc - sw2c))
             END + 1e-9, 2) AS ewm_cov,
           round(CASE WHEN rn >= 2 THEN
             (sxy/sw - (sx/sw)*(sy/sw)) /
             sqrt((sxx/sw - (sx/sw)*(sx/sw)) * (syy/sw - (sy/sw)*(sy/sw)))
             END + 1e-9, 4) AS ewm_corr
         FROM c ORDER BY user_id, event_id""")
}
