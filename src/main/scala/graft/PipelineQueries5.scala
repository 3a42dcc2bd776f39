package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Core
import graft.pipeline._

/** Fifth pipeline tranche (round 12): connectivity-only (spanning-edge)
  * dedup emission modes. Same conventions as [[PipelineQueries]]. */
object PipelineQueries5 {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Core.normalizeTs(s.read.parquet(s"$dir/$name.parquet"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- clusters over the spanning-edge (path-per-bucket) minhash
    //      emission: the edge SET is iterator-order-dependent, but the
    //      COMPONENTS must equal the all-pairs graph's — so this row
    //      runs the full cluster extraction over star-mode edges
    //      against the SAME oracle as q_dedup_clusters ----
    "q_dedup_clusters_star" -> ((s, d) =>
      Dedup.clusters(
        Dedup.minhashLshEdges(T(s, d, "documents"), "doc_id", "text",
          k = 3, bands = 4, rowsPerBand = 2))
        .orderBy("doc")),

    // ---- clusters over spanning edges of the shares-a-retained-
    //      shingle graph (ngram star mode, the sf1 blowup lever): the
    //      oracle recomputes the transitive closure over the FULL
    //      all-pairs share-a-shingle graph — equality proves spanning
    //      emission preserved every component ----
    "q_ngram_star_clusters" -> ((s, d) =>
      Dedup.clusters(
        Dedup.ngramShingleEdges(T(s, d, "documents"), "doc_id", "text",
          k = 3, maxShingleDf = 1000))
        .orderBy("doc")))

  val oracle: Map[String, String] = Map(

    // identical closure to q_dedup_clusters: star-mode edges must not
    // change a single component
    "q_dedup_clusters_star" ->
      s"""WITH RECURSIVE ${PipelineQueries.ClustersCte}
         SELECT doc, min(r) AS cluster_rep FROM reach GROUP BY doc
         ORDER BY doc""",

    // transitive closure over ALL pairs sharing >= 1 retained shingle
    // (df cap mirrors maxShingleDf=1000); the Spark side only ever
    // materializes spanning paths of this graph
    "q_ngram_star_clusters" ->
      s"""WITH RECURSIVE ${PipelineQueries.ShingleCte},
         shf AS (SELECT * FROM sh WHERE s IN
                   (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000)),
         prs AS (SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
                 FROM shf a JOIN shf c
                   ON a.s = c.s AND a.doc_id < c.doc_id),
         edges AS (SELECT doc1 AS a, doc2 AS b FROM prs
                   UNION ALL SELECT doc2, doc1 FROM prs),
         reach(doc, r) AS (
           SELECT a, a FROM edges
           UNION
           SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.doc
         )
         SELECT doc, min(r) AS cluster_rep FROM reach GROUP BY doc
         ORDER BY doc""")
}
