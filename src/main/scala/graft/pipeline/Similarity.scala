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

  /** Native codegen dot product for the pairwise hot path
    * ([[graft.functions.DotProduct]]). History: the higher-order-function
    * form above is CodegenFallback (interpreted lambda per element —
    * ~40µs/pair at d=64); a compiled Scala UDF was ~100x faster but still
    * copied each array into a boxed Seq per call; the native expression
    * reads the UnsafeArrayData in place inside whole-stage codegen.
    * Ascending-index accumulation, exactly like the sequential oracle. */
  private def dotNative(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  /** L2 norm, computed once per VECTOR (map-side), not once per pair.
    * Native expression for the same reason as [[dotNative]]. */
  private val l2norm: Column => Column =
    graft.functions.VectorFunctions.l2norm

  /** Pairwise cosine from precomputed norms: same formula and summation
    * order as [[cosine]], but O(d) work per pair instead of O(3d). */
  private def pairCos(v1: Column, n1: Column, v2: Column, n2: Column): Column =
    when(n1 > 0 && n2 > 0, dotNative(v1, v2) / (n1 * n2))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query vector (brute force).
    * Queries must be small enough to broadcast. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", qVec: String = "embedding",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), asDouble(col(qVec)).as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), asDouble(col(cVec)).as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(col("qv"), col("qn"), col("cv"), col("cn")))
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

  /** Sign-bit LSH bucket id of a vector column under the given planes.
    * One compiled kernel over the whole plane matrix (the per-plane HOF
    * form ran `planes` interpreted array reductions per vector). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val m = planes.map(_.toArray).toArray
    val f = udf { v: Seq[Double] =>
      var b = 0L
      var p = 0
      while (p < m.length) {
        val pl = m(p)
        var i = 0; var d = 0.0
        val n = math.min(v.length, pl.length)
        while (i < n) { d += v(i) * pl(i); i += 1 }
        if (d >= 0) b |= 1L << p
        p += 1
      }
      b
    }
    f(vec)
  }

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
    val scored = c.withColumn("cn", l2norm(col("cv")))
      .join(q.withColumn("qn", l2norm(col("qv"))), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** The `tables` seeded plane sets for [[lshTopKMulti]] — exposed so
    * an external oracle can regenerate the identical constants. */
  def multiPlanes(planes: Int, dim: Int, tables: Int,
                  seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    (0 until tables).map(t => hyperplanes(planes, dim, seed + 7919L * t))

  /** Multi-table (OR-amplified) LSH ANN top-k — the recall-tuned scale
    * path. Each of `tables` independent plane sets buckets both sides;
    * the candidate set is the DISTINCT union of same-bucket pairs over
    * all tables, scored once. Single-table recall r becomes
    * ~1-(1-r)^tables while candidates stay sub-linear
    * (~tables * corpus / 2^planes per query). One bucket-join shuffle +
    * one dedup shuffle; vectors join back by id so the wide embedding
    * rows never ride through the bucket explode. */
  def lshTopKMulti(queries: DataFrame, corpus: DataFrame, k: Int,
                   planes: Int, tables: Int, dim: Int,
                   seed: Long = 42L): DataFrame = {
    val sets = multiPlanes(planes, dim, tables, seed)
    val m: Array[Array[Array[Double]]] =
      sets.map(_.map(_.toArray).toArray).toArray
    val bUdf = udf { v: Seq[Double] =>
      val arr = v.toArray
      m.indices.map { t =>
        val pls = m(t)
        var b = 0L
        var p = 0
        while (p < pls.length) {
          val pl = pls(p)
          var i = 0; var d = 0.0
          val n = math.min(arr.length, pl.length)
          while (i < n) { d += arr(i) * pl(i); i += 1 }
          if (d >= 0) b |= 1L << p
          p += 1
        }
        (t, b)
      }
    }
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val qb = q.select(col("query_id"), explode(bUdf(col("qv"))).as("tb"))
      .select(col("query_id"), col("tb._1").as("t"), col("tb._2").as("bkt"))
    val cb = c.select(col("neighbor_id"), explode(bUdf(col("cv"))).as("tb"))
      .select(col("neighbor_id"), col("tb._1").as("t"), col("tb._2").as("bkt"))
    val cand = qb.join(cb, Seq("t", "bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cand
      .join(broadcast(q.withColumn("qn", l2norm(col("qv")))), Seq("query_id"))
      .join(c.withColumn("cn", l2norm(col("cv"))), Seq("neighbor_id"))
      .withColumn("cos", pairCos(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF (inverted-file) ANN top-k: the corpus is partitioned into
    * `nlist` cells by nearest centroid; each query scores only its
    * `nprobe` nearest cells. Candidate volume is ~corpus*nprobe/nlist
    * per query, one shuffle keyed by cell id — the standard billion-
    * vector layout (FAISS IVFFlat) expressed as a Spark equi-join.
    *
    * Centroids are a deterministic hash-ordered corpus sample collected
    * to the driver and broadcast (production: k-means via MLlib — the
    * join shape is identical, only centroid quality changes). Cell
    * assignment and probe lists are compiled UDFs over the broadcast
    * centroid matrix: O(nlist*d) per vector, map-side, no shuffle.
    * `nprobe = nlist` degrades to exact search — the spec's oracle. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nlist: Int,
              nprobe: Int, seed: Long = 42L): DataFrame =
    ivfTopKWith(queries, corpus,
      corpus.select(col("vec_id"), col("embedding"))
        .withColumn("__h", xxhash64(asDouble(col("embedding")).cast("string"),
          lit(seed)))
        .orderBy("__h").limit(nlist).drop("__h"),
      k, nprobe)

  /** [[ivfTopK]] with an EXPLICIT centroid table (vec_id, embedding) —
    * lets callers pick deterministic, externally-reproducible centroids
    * (fixed ids, k-means output, …); the default overload hash-samples
    * `nlist` corpus rows. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame,
                  centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def l2(v: Array[Double]): Double = {
      var i = 0; var s = 0.0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    // ordered by centroid id so cell indexes (and first-max tie-breaks)
    // are deterministic and SQL-reproducible
    val cents: Array[(Array[Double], Double)] = centroids
      .orderBy(col("vec_id"))
      .select(asDouble(col("embedding")).as("v")).as[Array[Double]].collect()
      .map(v => (v, l2(v)))
    val bc = spark.sparkContext.broadcast(cents)
    def cellScores(v: Seq[Double]): Array[Double] = {
      val cs = bc.value
      val arr = v.toArray
      val n = l2(arr)
      cs.map { case (cv, cn) =>
        if (n == 0 || cn == 0) -2.0
        else {
          var i = 0; var d = 0.0
          val len = math.min(arr.length, cv.length)
          while (i < len) { d += arr(i) * cv(i); i += 1 }
          d / (n * cn)
        }
      }
    }
    val assignUdf = udf { v: Seq[Double] =>
      val s = cellScores(v)
      var best = 0; var i = 1
      while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
      best
    }
    val probeUdf = udf { v: Seq[Double] =>
      cellScores(v).zipWithIndex.sortBy(-_._1).take(nprobe).map(_._2)
    }
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
      .withColumn("cell", assignUdf(col("cv")))
      .withColumn("cn", l2norm(col("cv")))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("cell", explode(probeUdf(col("qv"))))
      .withColumn("qn", l2norm(col("qv")))
    val scored = c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** recall@k of an ANN result against the exact baseline: per query,
    * |ANN neighbors ∩ exact top-k| / k. Queries the ANN missed entirely
    * surface with recall 0 (left join from the exact side, which by
    * construction has every query). Inputs are (query_id, neighbor_id,
    * …) frames as produced by the *TopK methods. */
  def recallAtK(ann: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = ann.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("__hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("__hits"), lit(0L)) / k.toDouble).as("recall"))
  }

  /** Exact embedding near-duplicate pairs: all pairs with cosine >=
    * threshold. The corpus (necessarily bounded — exact all-pairs is
    * O(n²); use [[nearDupPairs]] for large n) is broadcast as a plain
    * JVM matrix and each partition scans it in a tight primitive loop:
    * one array conversion per VECTOR instead of two per PAIR. The
    * join-with-UDF formulation allocated ~1KB per pair (2GB of garbage
    * across 2M pairs) and its run time varied 1.7-16s with heap state;
    * this form is allocation-free in the inner loop. */
  def nearDupPairsExact(df: DataFrame, threshold: Double,
                        parallelism: Int = 64,
                        maxRows: Long = 500000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def l2(v: Array[Double]): Double = {
      var i = 0; var s = 0.0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val vecs = df.select(col("vec_id").cast("long"),
      asDouble(col("embedding"))).as[(Long, Array[Double])]
    // Fail FAST before the driver collect: this baseline is O(n²) with a
    // driver-resident corpus, sized for validation runs only. Above the
    // cap, refuse loudly instead of OOMing an executor or the driver —
    // the cluster-scale paths are nearDupPairs (LSH-bucketed exact),
    // annIvf, and pqTopK.
    val n = vecs.count()
    require(n <= maxRows,
      s"nearDupPairsExact: $n vectors exceeds maxRows=$maxRows; this " +
        "all-pairs baseline broadcasts the corpus to every task — use " +
        "nearDupPairs (LSH) / annIvf / pqTopK at this scale, or raise " +
        "maxRows explicitly if this is a deliberate validation run")
    val corpus = vecs.collect().map { case (id, v) => (id, v, l2(v)) }
    val bc = spark.sparkContext.broadcast(corpus)
    vecs.repartition(parallelism).mapPartitions { it =>
      val cand = bc.value
      it.flatMap { case (id1, v1) =>
        val n1 = l2(v1)
        val out = Seq.newBuilder[(Long, Long, Double)]
        var j = 0
        while (j < cand.length) {
          val (id2, v2, n2) = cand(j)
          if (id1 < id2 && n1 > 0 && n2 > 0) {
            var i = 0; var d = 0.0
            val n = math.min(v1.length, v2.length)
            while (i < n) { d += v1(i) * v2(i); i += 1 }
            val cos = d / (n1 * n2)
            if (cos >= threshold) out += ((id1, id2, cos))
          }
          j += 1
        }
        out.result().iterator
      }
    }.toDF("id1", "id2", "cos")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold. Brute force
    * within LSH buckets (exact within bucket) — the 100 TB path, where
    * the all-pairs exact form is infeasible. */
  def nearDupPairs(df: DataFrame, threshold: Double, planes: Int, dim: Int,
                   seed: Long = 42L): DataFrame = {
    val ps = hyperplanes(planes, dim, seed)
    val v = df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), ps))
      .withColumn("n", l2norm(col("v")))
    val l = v.select(col("vec_id").as("id1"), col("v").as("v1"),
      col("n").as("n1"), col("bucket"))
    val r = v.select(col("vec_id").as("id2"), col("v").as("v2"),
      col("n").as("n2"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("id1") < col("id2"))
      .withColumn("cos", pairCos(col("v1"), col("n1"), col("v2"), col("n2")))
      .filter(col("cos") >= threshold)
      .select("id1", "id2", "cos").distinct()
  }

  /** Distributed Lloyd's k-means over an embedding column — the proper
    * trainer for [[ivfTopKWith]]'s coarse quantizer (hash-sampled
    * centroids are the zero-cost fallback; a few Lloyd iterations cut
    * IVF probe misses substantially).
    *
    * Scale shape per iteration: centroids live on the DRIVER (k × dim
    * doubles — tiny) and enter the plan as literals, so assignment is a
    * zero-shuffle codegen projection (argmin over k fold expressions);
    * the update is one hash-aggregate keyed (cluster, dim) — 64·N rows
    * spread over the cluster, no hot key. Nothing frame-sized ever
    * serializes to the driver.
    *
    * Determinism: init = the k lowest-id vectors (cid by id order);
    * argmin ties break to the lowest cid via struct array_min; centroid
    * means are exact sums of float32-valued doubles (order-independent
    * because no addition ever rounds: 24-bit mantissas with bounded
    * exponent spread fit in 53 bits), so re-runs — and the DuckDB
    * oracle — reproduce the trajectory bit-for-bit.
    *
    * Returns (vec_id, cluster, dist): final assignment against the
    * post-iteration centroids, dist = Euclidean. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int, iters: Int): DataFrame =
    kmeansAssign(df, idCol, vecCol,
        kmeansCentroids(df, idCol, vecCol, k, iters))
      .select(col("vec_id"), col("__best.c").as("cluster"),
        sqrt(col("__best.d")).as("dist"))

  /** Map-side argmin assignment against literal centroids (see
    * [[kmeans]]'s scale note): zero shuffle, pure codegen projection.
    * Keeps `x` and `__best.{d,c}` so callers can continue the plan. */
  private def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                           cents: Array[Array[Double]]): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("vec_id"),
      asDouble(col(vecCol)).as("x"))
    def sqDist(cv: Array[Double]): Column = sqDistLit(col("x"), cv)
    base.withColumn("__best",
      array_min(array(cents.zipWithIndex.map { case (cv, i) =>
        struct(sqDist(cv).as("d"), lit(i).as("c"))
      }: _*)))
  }

  /** The Lloyd loop of [[kmeans]], returning the trained k × dim
    * centroid matrix (driver-sized by construction). */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): Array[Array[Double]] = {
    require(k > 0 && iters >= 0, s"kmeans: need k>0, iters>=0")
    val base = df.select(col(idCol).cast("long").as("vec_id"),
      asDouble(col(vecCol)).as("x"))
    var cents: Array[Array[Double]] = base.orderBy("vec_id").limit(k)
      .select("x").collect().map(_.getSeq[Double](0).toArray)
    require(cents.length == k, s"kmeans: k=$k but only ${cents.length} rows")
    for (_ <- 0 until iters) {
      val sums = kmeansAssign(df, idCol, vecCol, cents)
        .select(col("__best.c").as("cid"), posexplode(col("x")).as(Seq("p", "v")))
        .groupBy("cid", "p")
        .agg(sum("v").as("s"), count("v").as("n"))
        .collect()
      val next = cents.map(_.clone()) // empty cluster keeps its centroid
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    cents
  }

  // ---------------------------------------------------------------
  // SemDeDup — semantic dedup: k-means partition + in-cluster cosine
  // ---------------------------------------------------------------

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    * embedding space with k-means, then compare vectors ONLY within
    * their own cluster — a vector is a semantic duplicate iff some
    * same-cluster vector has cosine >= `tau` and a smaller id
    * (deterministic min-id survivor, the same rule as
    * [[Dedup.fuzzy]]'s cluster representative).
    *
    * Scale shape: assignment is the zero-shuffle literal-centroid
    * projection from [[kmeans]] — no n×n join-back by id — and the
    * pair generation keys its ONE shuffle on the cluster id, so pair
    * work is Σ|c|², never corpus-wide O(n²). At 100 TB pick k ∝ n
    * (the paper runs ~n/200 clusters) to bound cluster sizes; norms
    * are computed once per vector map-side; each surviving pair costs
    * one native codegen dot ([[graft.functions.DotProduct]]).
    *
    * The threshold is applied to round(cos + 1e-9, 6) so a libm ulp
    * can never flip a keep decision across engines or reruns (same
    * convention as [[graft.pipeline.Curation.mixtureRates]]).
    *
    * `maxCluster` bounds the quadratic: a skewed k-means (one
    * mega-cluster — common on the near-duplicate-heavy corpora SemDeDup
    * is run on) would otherwise make the in-cluster join Σ|c|² in its
    * hottest cluster. Clusters over the cap degrade to the STAR
    * fallback ([[graft.pipeline.Dedup.minhashLshPairs]]'s pattern):
    * each member is compared only against the cluster's min-id hub —
    * O(|c|) pairs, and dup_of stays the deterministic min-id survivor
    * (members similar to each other but not to the hub are missed;
    * that is the documented approximation, exactly as in the LSH
    * bucket cap). Size the cap so Σ|c|²·dim fits the stage budget —
    * with the paper's k ∝ n/200 the cap never fires on a balanced fit.
    *
    * Returns one row per vector: (vec_id, cluster, keep, dup_of) with
    * dup_of = the smallest qualifying same-cluster id (null ⇒ keep=1). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, tau: Double,
               maxCluster: Int = 100000): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters)
    val m = kmeansAssign(df, idCol, vecCol, cents)
      .select(col("vec_id"), col("__best.c").as("cluster"), col("x").as("__v"))
      .withColumn("__n", l2norm(col("__v")))
    val dups = semDedupCandidates(m, maxCluster)
      .filter(round(pairCos(col("__va"), col("__na"), col("__vb"), col("__nb"))
        + lit(1e-9), 6) >= tau)
      .groupBy(col("__b").as("vec_id"))
      .agg(min(col("__a")).as("dup_of"))
    m.select(col("vec_id"), col("cluster"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("dup_of").isNull.cast("int").as("keep"), col("dup_of"))
  }

  /** Candidate pair stream of [[semDedup]]: all in-cluster (a < b)
    * pairs for clusters within `maxCluster`, hub-star pairs (min-id
    * member vs everyone else) for clusters over it. Cluster sizes ride
    * a ≤k-row broadcast, so the cold/hot split is a map-side filter and
    * the hot path adds no shuffle of the frame (hubs are ≤k rows,
    * broadcast). Package-visible so the spec can assert the O(|c|)
    * degradation directly. */
  private[graft] def semDedupCandidates(m: DataFrame,
                                        maxCluster: Int): DataFrame = {
    val sizes = m.groupBy(col("cluster")).agg(count(lit(1)).as("__cn"))
    val mm = m.join(broadcast(sizes), Seq("cluster"))
    val cold = mm.filter(col("__cn") <= maxCluster)
    val coldPairs = cold
      .select(col("cluster"), col("vec_id").as("__a"),
        col("__v").as("__va"), col("__n").as("__na"))
      .join(cold.select(col("cluster"), col("vec_id").as("__b"),
        col("__v").as("__vb"), col("__n").as("__nb")), Seq("cluster"))
      .filter(col("__a") < col("__b"))
    val hot = mm.filter(col("__cn") > maxCluster)
    // hub = the min-id member WITH its vector: struct min orders by the
    // leading vec_id field, so one hash aggregate carries the payload
    val hubs = hot.groupBy(col("cluster"))
      .agg(min(struct(col("vec_id"), col("__v"), col("__n"))).as("__h"))
      .select(col("cluster"), col("__h.vec_id").as("__a"),
        col("__h.__v").as("__va"), col("__h.__n").as("__na"))
    val hotPairs = hot.join(broadcast(hubs), Seq("cluster"))
      .filter(col("vec_id") =!= col("__a"))
      .select(col("cluster"), col("__a"), col("__va"), col("__na"),
        col("vec_id").as("__b"), col("__v").as("__vb"), col("__n").as("__nb"))
    coldPairs.unionByName(hotPairs)
  }

  // ---------------------------------------------------------------
  // Product quantization (PQ) — compressed ANN at corpus scale
  // ---------------------------------------------------------------

  /** Squared L2 between a vector column and a literal centroid — the
    * same zip_with/aggregate codegen shape as [[kmeansAssign]]. */
  /** Native graft_sqdist kernel against a literal centroid — float-
    * identical to the aggregate(zip_with) left fold it replaced
    * (ascending-index accumulation from 0.0), so every SQL oracle built
    * on list_reduce stays bit-exact; ~20x cheaper per evaluation and
    * codegen-capable when no enclosing HOF blocks it. */
  private def sqDistLit(v: Column, cv: Array[Double]): Column =
    graft.functions.VectorFunctions.sqdist(v, array(cv.map(lit): _*))

  /** Train PQ codebooks: split the `dim`-dimensional space into `m`
    * contiguous subspaces of dim/m and run the bit-reproducible Lloyd
    * trainer ([[kmeansCentroids]]) independently in each — m bounded
    * jobs, each identical in shape to the IVF trainer. Returns
    * m × k × (dim/m) sub-centroids. */
  def pqTrainCodebooks(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, m: Int, k: Int,
                       iters: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"pq: dim=$dim not divisible by m=$m")
    val w = dim / m
    (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(asDouble(col(vecCol)), s * w + 1, w).as("__sub"))
      kmeansCentroids(sub, idCol, "__sub", k, iters)
    }.toArray
  }

  /** PQ-encode every vector: m argmin-over-codebook codes, all from
    * literal centroids — pure map-side codegen, ZERO shuffle, and the
    * output is m small ints per vector instead of dim floats (the
    * 100 TB story: a 64-dim float corpus compresses 64x, so the
    * scoring scan reads codes, not vectors). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               books: Array[Array[Array[Double]]]): DataFrame = {
    val w = books(0)(0).length
    val base = df.select(col(idCol).cast("long").as("vec_id"),
      asDouble(col(vecCol)).as("x"))
    base.select(col("vec_id"),
      array(books.indices.map { s =>
        // native one-kernel argmin (r15): bit-identical to the
        // struct-min tree it replaces — [[graft.functions.NearestCentroid]]
        graft.functions.NearestCentroid.nearestCentroid(
          col("x"), books(s), s * w, w)
      }: _*).as("codes"))
  }

  /** Exact squared-L2 top-k — the baseline [[pqTopK]] approximates
    * (cosine companion: [[bruteForceTopK]]). Same broadcast-queries
    * cross join + WindowGroupLimit shape. */
  def bruteForceTopKL2(queries: DataFrame, corpus: DataFrame, k: Int,
                       qId: String = "vec_id", qVec: String = "embedding",
                       cId: String = "vec_id",
                       cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).cast("long").as("query_id"),
      asDouble(col(qVec)).as("qv"))
    val c = corpus.select(col(cId).cast("long").as("neighbor_id"),
      asDouble(col(cVec)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist",
        graft.functions.VectorFunctions.sqdist(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist", "rank")
  }

  /** Asymmetric-distance (ADC) top-k: queries stay exact, the corpus
    * is its PQ codes. Each (query, doc) score is
    * sum_s ||q_sub_s - centroid[s][code_s]||² — element_at into the
    * literal codebook arrays, all inside codegen; the corpus-side scan
    * touches only (id, codes). Broadcast queries, one WindowGroupLimit
    * top-k per query; self-matches excluded like [[bruteForceTopK]].
    * Returns (query_id, neighbor_id, dist, rank), rank by ascending
    * approximate squared distance. */
  def pqTopK(queries: DataFrame, codes: DataFrame,
             books: Array[Array[Array[Double]]], k: Int,
             qId: String = "vec_id", qVec: String = "embedding"): DataFrame = {
    val w = books(0)(0).length
    // ADC lookup table (r15, guide §1.2 step 2 — per-task work):
    // ||q_sub_s - book[s][c]||² is a pure function of the QUERY, so
    // compute all m×k entries ONCE per query row BEFORE the broadcast;
    // each (query, candidate) pair then reads m table cells instead of
    // re-running m subvector sqdist kernels (with their slice
    // allocations). Float-identical: every entry is the exact sqdist
    // the per-pair form computed, summed in the same subspace order.
    val q = queries.select(col(qId).cast("long").as("query_id"),
        asDouble(col(qVec)).as("qv"))
      .withColumn("qlut", array(books.indices.map { s =>
        array(books(s).map(cv => graft.functions.VectorFunctions.sqdist(
          slice(col("qv"), s * w + 1, w), array(cv.map(lit): _*))): _*)
      }: _*))
      .drop("qv")
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dist", books.indices.map { s =>
        element_at(element_at(col("qlut"), s + 1),
          col("codes").getItem(s) + 1)
      }.reduce(_ + _))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("dist"), col("rank"))
  }

  /** Semantic decontamination: flag corpus documents whose embedding is
    * too close to ANY benchmark/eval-set embedding — the embedding-space
    * complement of the k-gram [[Curation.decontaminate]] (catches
    * paraphrased eval leakage that exact n-grams miss). The benchmark
    * suite is SMALL by definition, so its vectors (and precomputed
    * norms) ride a single nested-array Literal; each corpus row takes a
    * map-side max over the bench matrix via the native dot kernel —
    * ZERO shuffle, scan-speed at any corpus size, O(|bench| * d) per
    * row. An eval set larger than `maxBenchLiteral` would explode plan
    * size (the literal matrix is inlined into every task's codegen), so
    * above it the SAME semantics run off a Spark BROADCAST VARIABLE and
    * a per-row max UDF — one copy of the bench matrix per executor,
    * still zero shuffle and still exactly one output row per corpus row
    * BY CONSTRUCTION (a join+groupBy on a generated row-id would lose
    * that under task retry, since monotonically_increasing_id is not
    * stable across attempts). Both branches share ONE driver collect
    * that is `limit`-capped at `maxBenchRows`, so the driver-memory
    * bound is binding at collect time, not a separate racy count probe;
    * above the cap the call fails loudly naming [[ivfTopKWith]] /
    * [[Curation.decontaminate]] as the distributed alternatives (an
    * eval "benchmark" bigger than that is a corpus-vs-corpus join, not
    * a decontamination pass). Returns (id, max_cos, contaminated);
    * filter on the flag to drop. Zero-norm vectors score null max_cos
    * but a FALSE (not null) contaminated flag, so `filter(!contaminated)`
    * keeps them — a three-valued null flag would silently drop clean
    * rows. NaN-norm vectors (a NaN element) follow the zero-norm rule
    * on BOTH sides, and null bench vectors are dropped up front. If
    * EVERY bench vector is degenerate (zero/NaN/Inf norm) the call
    * fails loudly instead of failing open — a broken upstream
    * embedding job must not mark the whole corpus clean. */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
                            threshold: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            maxBenchLiteral: Int = 4096,
                            maxBenchRows: Int = 262144): DataFrame = {
    def l2(v: Array[Double]): Double =
      math.sqrt(v.map(x => x * x).sum)
    // ONE limit-capped collect decides the branch. A count probe
    // followed by an uncapped collect is TOCTOU: a bench whose plan is
    // non-deterministic (unseeded sample, growing directory) could pass
    // the probe and still hand the driver an unbounded collect. The
    // limit makes the bound binding on the collect itself.
    val collected: Array[Array[Double]] = bench.orderBy(col(idCol))
      .filter(col(vecCol).isNotNull) // null vectors never match; a
      // driver-side getSeq(null).toArray would NPE before any branch
      .select(asDouble(col(vecCol)).as("v")).limit(maxBenchRows + 1)
      .collect().map(_.getSeq[Double](0).toArray)
    require(collected.nonEmpty, "semanticDecontaminate: empty benchmark set")
    require(collected.length <= maxBenchRows,
      s"semanticDecontaminate: benchmark set exceeds maxBenchRows=" +
        s"$maxBenchRows (~${maxBenchRows.toLong * 8 * collected.head.length /
          (1 << 20)} MB at dim ${collected.head.length}) — an eval set that " +
        "large is a corpus-vs-corpus problem; use ivfTopKWith/lshTopKMulti or " +
        "Curation.decontaminate instead")
    // zero/NaN/Inf-norm bench vectors can never produce a meaningful
    // cosine — drop them ONCE here so both branches share identical
    // semantics (the old per-branch guards disagreed on non-finite
    // norms: Catalyst orders NaN above every number and Inf/Inf is a
    // NaN cosine, Scala compares both false)
    val bvecs: Array[Array[Double]] =
      collected.filter(v => { val n = l2(v); n > 0 && !n.isNaN &&
        !n.isInfinite })
    // fail CLOSED when the whole benchmark is degenerate: a broken
    // upstream embedding job (all-zero / NaN vectors) must not silently
    // mark the entire corpus clean — mirrors the empty-bench guard
    require(bvecs.nonEmpty, "semanticDecontaminate: all benchmark " +
      "vectors are degenerate (zero/NaN/Inf norm) — refusing to mark " +
      "the corpus clean against an unusable benchmark")
    val base = corpus.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("__v"))
      .withColumn("__n", l2norm(col("__v")))
    // corpus-side validity: positive FINITE norm, so the literal
    // branch's Catalyst compares (NaN > 0 is TRUE in SQL; an Inf norm
    // makes a NaN cosine that array_max surfaces as the max) stay
    // aligned with the UDF branch's Scala compares (both false). A
    // residual caveat survives any guard: elements large enough to
    // overflow the DOT to +/-Inf with finite norms (~1e154) can still
    // produce a NaN cosine — normalize such embeddings upstream.
    val vOk = col("__n") > 0 && !isnan(col("__n")) &&
      col("__n") =!= Double.PositiveInfinity
    if (bvecs.length <= maxBenchLiteral) {
      val bLit = typedlit(bvecs.map(_.toSeq).toSeq)
      val bNorms = typedlit(bvecs.map(l2).toSeq)
      val mx =
        array_max(transform(sequence(lit(0), lit(bvecs.length - 1)),
          i => when(vOk,
            dotNative(col("__v"), element_at(bLit, i + 1)) /
              (col("__n") * element_at(bNorms, i + 1)))))
      base.select(col("id"), mx.as("max_cos"),
        coalesce(mx >= threshold, lit(false)).as("contaminated"))
    } else {
      // Large eval set: ship the matrix ONCE per executor as a
      // broadcast variable and take the per-row max in a UDF — no
      // join, no groupBy, no generated row-id, so the one-row-per-
      // corpus-row contract survives task retries and duplicate ids.
      val bNorms: Array[Double] = bvecs.map(l2)
      val bc = corpus.sparkSession.sparkContext.broadcast((bvecs, bNorms))
      val maxCos = udf { (v: Seq[Double]) =>
        if (v == null) None
        else {
          val (bv, bn) = bc.value
          val arr = v.toArray
          var n = 0.0
          var j = 0
          while (j < arr.length) { n += arr(j) * arr(j); j += 1 }
          n = math.sqrt(n)
          var best = Double.NegativeInfinity
          var any = false
          var i = 0
          while (i < bv.length) {
            // mirror vOk: positive FINITE norm (bench norms are
            // pre-filtered; NaN compares false here by itself)
            if (n > 0 && !n.isInfinite && bn(i) > 0) {
              val b = bv(i)
              val d = math.min(arr.length, b.length)
              var s = 0.0
              var k = 0
              while (k < d) { s += arr(k) * b(k); k += 1 }
              val c = s / (n * bn(i))
              if (c > best) best = c
              any = true
            }
            i += 1
          }
          if (any) Some(best) else None
        }
      }
      val mx = maxCos(col("__v"))
      base.select(col("id"), mx.as("max_cos"),
        coalesce(mx >= threshold, lit(false)).as("contaminated"))
    }
  }

  /** IVF-PQ combined ANN (FAISS IVFPQ shape): coarse cells bound the
    * candidate set, residual PQ codes bound the bytes read per
    * candidate — the composition is THE billion-vector layout, and the
    * genuine scale upgrade over [[pqTopK]]'s broadcast cross join:
    *
    *   - corpus side: nearest-cell assignment, residual x - c_cell, and
    *     m argmin codebook codes — ALL literal-centroid codegen over the
    *     scan, zero shuffle; the scored representation is
    *     (id, cell, m codes), independent of dim.
    *   - query side: `nprobe` nearest cells per query (lexicographic
    *     struct sort = deterministic dist-then-id tie-break), one
    *     per-cell residual each.
    *   - scoring: ONE equi-join keyed by cell — candidate volume is
    *     ~corpus * nprobe / nlist per query, never all-pairs and never a
    *     corpus broadcast — then ADC
    *     `sum_s ||(q - c_cell)_s - book[s][code_s]||^2` inside codegen
    *     and a WindowGroupLimit top-k.
    *
    * `cells`/`books` are literal matrices (nlist x dim, m x k x dim/m):
    * right for nlist up to a few thousand; beyond that pass centroids
    * via broadcast UDF ([[ivfTopKWith]]'s pattern) — the join shape is
    * identical. `nprobe = nlist` degrades to exact-over-codes (= pqTopK
    * ranking on residual codebooks). Fold/tie-break orders mirror
    * [[pqTopK]]/[[graft.functions.NearestCentroid]] so a SQL oracle can
    * replicate bit-exact. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
                cells: Array[Array[Double]],
                books: Array[Array[Array[Double]]],
                k: Int, nprobe: Int,
                qId: String = "vec_id", qVec: String = "embedding",
                cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    val w = books(0)(0).length
    // ONE nested-array Literal per matrix (not a CreateArray-of-
    // CreateArrays tree): plan size is O(1) in nlist and m*k, which
    // keeps Catalyst analysis/codegen sub-second where the unrolled
    // per-centroid expression forest cost ~5s of planning per query
    val cellsLit = typedlit(cells.map(_.toSeq).toSeq)
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    // native kernel, float-identical to the aggregate(zip_with) left
    // fold (and so to the SQL oracle's list_reduce)
    def sqd(a: Column, b: Column): Column =
      graft.functions.VectorFunctions.sqdist(a, b)
    // (dist, cell-index) structs; array_min/array_sort lexicographic
    // order = dist-then-lowest-index tie-break, same as NearestCentroid
    def cellStructs(v: Column) =
      transform(sequence(lit(0), lit(cells.length - 1)),
        i => struct(sqd(v, element_at(cellsLit, i + 1)).as("d"),
          i.as("c")))
    val c0 = corpus
      .select(col(cId).cast("long").as("neighbor_id"),
        asDouble(col(cVec)).as("x"))
      // native one-kernel argmins (r15): bit-identical to the
      // struct-min trees they replace — [[graft.functions.NearestCentroid]]
      .withColumn("cell", graft.functions.NearestCentroid
        .nearestCentroid(col("x"), cells, 0, cells(0).length))
      .withColumn("rv", zip_with(col("x"),
        element_at(cellsLit, col("cell") + 1), (a, b) => a - b))
    val codes = c0.select(col("neighbor_id"), col("cell"),
      array(books.indices.map { s =>
        graft.functions.NearestCentroid.nearestCentroid(
          col("rv"), books(s), s * w, w)
      }: _*).as("codes"))
    val q0 = queries
      .select(col(qId).cast("long").as("query_id"),
        asDouble(col(qVec)).as("qx"))
      .withColumn("cell", explode(transform(
        slice(array_sort(cellStructs(col("qx"))), 1, nprobe),
        p => p.getField("c"))))
      .withColumn("qrv", zip_with(col("qx"),
        element_at(cellsLit, col("cell") + 1), (a, b) => a - b))
      .drop("qx")
      // ADC lookup table (r15, same as [[pqTopK]]): the residual is a
      // pure function of (query, probed cell), so the m×k sqdist table
      // is computed once per q0 row — |queries| × nprobe rows — before
      // the cell-keyed join; scoring reads m cells per candidate.
      // Float-identical entries, same subspace summation order.
      .withColumn("qlut", array(books.indices.map { s =>
        array(books(s).indices.map { c =>
          sqd(slice(col("qrv"), s * w + 1, w),
            element_at(element_at(booksLit, s + 1), lit(c + 1)))
        }: _*)
      }: _*))
      .drop("qrv")
    // the query side is |queries| × nprobe rows BY CONTRACT — the small
    // side. The hint pins the build side (guide §3.1): size ESTIMATES
    // here are heuristic (explode × literal-heavy projections), and a
    // mis-estimate that broadcasts the CORPUS side instead would build
    // a corpus-sized hash relation on the driver every run (measured:
    // 2 s -> 20 s on the 10× stress row when the estimate flipped).
    val scored = codes.join(broadcast(q0), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist", books.indices.map { s =>
        element_at(element_at(col("qlut"), s + 1),
          col("codes").getItem(s) + 1)
      }.reduce(_ + _))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "dist", "rank")
  }

  /** Symmetric per-vector INT8 scalar quantization — the standard 4-8x
    * memory/IO lever for embedding stores (scan 1 byte/dim instead of
    * 4-8): q_i = floor(x_i * 127 / scale + 0.5) with scale =
    * max|x_i|, so q in [-127, 127] and the reconstruction error per
    * element is <= scale/254 + ulp (spec-gated). `floor(r + 0.5)` is
    * deliberate instead of round(): both engines (and both signs)
    * floor identically, where round()'s half-case direction is
    * engine-specific — the same determinism discipline as the 1e-6
    * rate quantization in [[Curation.mixtureSample]]. Zero vectors get
    * scale 0 and an all-zero code (dequantize restores exact zeros);
    * non-finite vectors (NaN/Inf element) get a NULL scale and an
    * all-zero code, so dequantize returns nulls, never garbage.
    * Pure codegen over the scan, zero shuffle. Emits (id, scale,
    * qvec: array<tinyint>). */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    Seq("__v", "scale", "qvec").foreach(n => require(idCol != n,
      s"quantizeInt8: idCol '$n' collides with an output column"))
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      // non-finite max|x| (a NaN/Inf element) -> NULL scale and an
      // all-zero code: dequantize then restores nulls, not garbage
      // (Catalyst would otherwise take the NaN > 0 branch and emit
      // codes that LOOK valid)
      .withColumn("scale", {
        val raw = array_max(transform(col("__v"), x => abs(x)))
        when(!isnan(raw) && raw =!= Double.PositiveInfinity, raw)
      })
      .select(col(idCol), col("scale"),
        transform(col("__v"), x => when(col("scale") > 0,
            floor(x * 127.0 / col("scale") + 0.5).cast("tinyint"))
          .otherwise(lit(0).cast("tinyint"))).as("qvec"))
  }

  /** Inverse of [[quantizeInt8]]: x_i ~ q_i * scale / 127. Returns
    * (id, embedding: array<double>) — feed straight back into any
    * top-k/dedup path to trade exactness for 4-8x less IO. */
  def dequantizeInt8(df: DataFrame, idCol: String = "vec_id",
                     qCol: String = "qvec",
                     scaleCol: String = "scale"): DataFrame = {
    require(idCol != "embedding",
      "dequantizeInt8: idCol 'embedding' collides with the output column")
    df.select(col(idCol),
      transform(col(qCol), q => q.cast("double") * col(scaleCol) / 127.0)
        .as("embedding"))
  }
}
