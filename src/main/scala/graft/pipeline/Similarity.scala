package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (exact
  * baseline) and random-hyperplane-LSH bucketed ANN (the scale path).
  *
  * The dot products are `zip_with` + `aggregate` higher-order functions —
  * pure Catalyst expressions, no UDF, so the whole scoring pipeline is
  * codegen'd.
  *
  * Scale shape: brute force is a broadcast nested loop (queries are
  * broadcast; corpus streamed) — right for <=1e4 queries against any
  * corpus size, O(Q*N*d). The LSH variant buckets both sides by
  * hyperplane sign bits so each query only scores its bucket —
  * sub-linear candidate sets at the cost of recall; increase `tables`
  * (OR-ed buckets) for recall. A production IVF variant would replace
  * the random planes with k-means centroids; same join shape.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query vector (brute force).
    * Queries must be small enough to broadcast. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", qVec: String = "embedding",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), asDouble(col(qVec)).as("qv"))
    val c = corpus.select(col(cId).as("neighbor_id"), asDouble(col(cVec)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic random hyperplanes: `planes` x `dim`, seeded. */
  def hyperplanes(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector column under the given planes. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(zip_with(vec, typedLit(p), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** ANN top-k: score only same-bucket candidates. One shuffle keyed by
    * the bucket id; per-bucket volume is corpus/2^planes on average. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int,
              dim: Int, seed: Long = 42L): DataFrame = {
    val ps = hyperplanes(planes, dim, seed)
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), ps))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), ps))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold. Brute force
    * within LSH buckets (exact within bucket). */
  def nearDupPairs(df: DataFrame, threshold: Double, planes: Int, dim: Int,
                   seed: Long = 42L): DataFrame = {
    val ps = hyperplanes(planes, dim, seed)
    val v = df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), ps))
    val l = v.select(col("vec_id").as("id1"), col("v").as("v1"), col("bucket"))
    val r = v.select(col("vec_id").as("id2"), col("v").as("v2"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("id1") < col("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select("id1", "id2", "cos").distinct()
  }
}
