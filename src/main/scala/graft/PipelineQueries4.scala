package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Core
import graft.pipeline._

/** Fourth pipeline tranche (round 11): corpus-operations additions —
  * quality-weighted per-stratum quotas and snapshot diffing. Same
  * conventions as [[PipelineQueries]]. */
object PipelineQueries4 {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Core.normalizeTs(s.read.parquet(s"$dir/$name.parquet"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- weighted per-stratum quota: keep <=50 docs per lang with
    //      inclusion odds proportional to n_chars (longer docs
    //      preferred but not guaranteed). lang is skewed (en 43%), so
    //      cap=50 exercises both the salted top-k path (en/es/zh) and
    //      the under-cap bypass (fr/de). The oracle recomputes the
    //      exponential-clock key -ln(u)/w from md5(doc_id)
    //      independently ----
    "q_weighted_cap" -> ((s, d) =>
      Curation.weightedCapPerStratum(T(s, d, "documents"),
          "doc_id", "lang", "n_chars", cap = 50)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("n_stratum"), col("wkey"))
        .orderBy("doc_id")),

    // ---- snapshot diff: old = docs minus every 7th id, with every
    //      5th id's text mutated; new = docs minus every 3rd id. All
    //      four statuses occur: added (7|id, 3∤id), removed (3|id,
    //      7∤id), changed (5|id, surviving both), unchanged (rest).
    //      The oracle diffs the raw columns directly — no digest — so
    //      a digest-encoding collision on the Spark side would show up
    //      as a status mismatch ----
    "q_snapshot_diff" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val old = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      val nw = docs.filter(col("doc_id") % 3 =!= 0)
      Curation.snapshotDiff(old, nw, "doc_id",
          Seq("text", "lang", "source"))
        .orderBy("doc_id")
    }))

  val oracle: Map[String, String] = Map(

    "q_weighted_cap" ->
      """WITH e AS (SELECT doc_id, lang, n_chars,
             round(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                       / 4294967296.0)
                   / CAST(n_chars AS DOUBLE), 6) AS wkey
           FROM documents WHERE n_chars > 0),
         c AS (SELECT lang, count(*) AS n_stratum FROM e GROUP BY 1),
         r AS (SELECT doc_id, lang, n_chars, wkey,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY wkey, doc_id) AS rn
               FROM e)
         SELECT doc_id, lang, n_chars, n_stratum, wkey
         FROM r JOIN c USING (lang)
         WHERE rn <= 50 ORDER BY doc_id""",

    "q_snapshot_diff" ->
      """WITH o AS (SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' v1' ELSE text END AS text,
             lang, source
           FROM documents WHERE doc_id % 7 <> 0),
         n AS (SELECT doc_id, text, lang, source
               FROM documents WHERE doc_id % 3 <> 0)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text IS NOT DISTINCT FROM n.text
                 AND o.lang IS NOT DISTINCT FROM n.lang
                 AND o.source IS NOT DISTINCT FROM n.source
                  THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         ORDER BY 1""")
}
