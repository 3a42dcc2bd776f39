package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Hash choice: md5 (hex string) everywhere a hash value must be
  * reproducible by the DuckDB oracle; at production scale swap
  * `xxhash64` (8 bytes vs 32, ~5x faster) — the structure is identical.
  *
  * Scale shape of each op:
  *   - exact: one hash-aggregate on the digest — a single shuffle keyed
  *     by a 128-bit hash, perfectly balanced.
  *   - MinHash LSH: per-doc signatures are map-side (no shuffle); the
  *     only shuffle is the explode-by-band groupBy, keyed by (band,
  *     signature) — candidate buckets, never all-pairs.
  *   - SimHash: map-side fingerprint, then band-bucket join on fingerprint
  *     bytes.
  *   - n-gram Jaccard: shingle-inverted-index join; emits only pairs that
  *     share a shingle. Hot shingles are capped (`maxShingleDf`) — the
  *     classic skew guard for inverted-index joins.
  */
object Dedup {

  /** Lowercased word array of a text column. */
  def words(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** k-shingles from a PRE-MATERIALIZED word-array column. `w` must be a
    * real attribute (`withColumn`), not an inline expression: a HOF
    * lambda body re-evaluates any referenced expression PER ELEMENT, so
    * an inline split would re-run the regex once per shingle (observed
    * 700µs/shingle -> the whole op pinned on the split). */
  def shinglesFromWords(w: Column, k: Int): Column =
    when(size(w) >= k,
      transform(sequence(lit(0), size(w) - k),
        i => concat_ws(" ", slice(w, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", w)))

  /** Lowercased word k-shingles of a text column. Convenience form for
    * small inputs — see [[shinglesFromWords]] for the hot path. */
  def shingles(c: Column, k: Int): Column = shinglesFromWords(words(c), k)

  /** Compiled DISTINCT k-shingle set (first-occurrence order, matching
    * array_distinct). The expression form above is CodegenFallback —
    * interpreted slice/concat per shingle measured ~300µs/shingle; this
    * JVM loop is ~1000x faster and is what the dedup ops use. */
  private def shingleSetUdf(k: Int) = udf { ws: Seq[String] =>
    if (ws == null || ws.isEmpty) Array.empty[String]
    else if (ws.length < k) Array(ws.mkString(" "))
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + k <= ws.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(ws(i + j)); j += 1 }
        out += sb.toString
        i += 1
      }
      out.toArray
    }
  }

  /** Exact dedup: keep the lowest id per identical text; report group
    * size. Hashing the text first keeps shuffle rows narrow (32-byte key
    * instead of whole documents). */
  def exact(df0: DataFrame, id: String, text: String): DataFrame = {
    val df = graft.engine.Core.spread(df0)
    df.select(col(id), md5(col(text)).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))
      .drop("__h")
  }

  /** LSH candidate pairs: docs sharing any band signature.
    *
    * Hash family: ONE md5 per distinct shingle, split into two 60-bit
    * halves (a, b); hash i is `a + i*b` (Kirsch-Mitzenmacher double
    * hashing — i < 8 keeps a + i*b < 2^63, no overflow). Versus md5 per
    * (seed, shingle) this is an 8x hash-cost reduction, and the min-
    * signatures come out of a codegen'd hash aggregate instead of
    * interpreted per-document array lambdas.
    *
    * Shape at scale: shingle explode is map-side; one shuffle keyed by
    * doc for the signature aggregate; one shuffle keyed by (band, sig)
    * for the bucket self-join — candidate buckets only, never all pairs. */
  def minhashLshPairs(df0: DataFrame, id: String, text: String,
                      k: Int = 3, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val df = graft.engine.Core.spread(df0)
    val nh = bands * rowsPerBand
    require(nh <= 8, "a + i*b needs i*b < 2^63: at most 8 hashes from 60-bit halves")
    val sh = df.select(col(id).as("doc"),
      explode(shingleSetUdf(k)(words(col(text)))).as("s"))
    val hashed = sh.select(col("doc"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("a"),
      conv(substring(md5(col("s")), 17, 15), 16, 10).cast("long").as("b"))
    val minAggs = (0 until nh).map(i =>
      min(col("a") + lit(i.toLong) * col("b")).as(s"h$i"))
    val mins = hashed.groupBy("doc").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until bands).map { bd =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${bd * rowsPerBand + r}"))
      struct(lit(bd).as("band"), concat_ws("|", hs.map(_.cast("string")): _*).as("sig"))
    }
    // materialize once: both self-join sides would otherwise recompute
    // the whole shingle+hash+aggregate subtree. The full signature vector
    // rides along so cross-band duplicate pairs can be dropped by a
    // FIRST-colliding-band filter instead of a distinct shuffle.
    val exploded = mins.select(col("doc"),
      array((0 until nh).map(i => col(s"h$i")): _*).as("harr"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("harr"), col("bk.band"), col("bk.sig"))
      .localCheckpoint()
    val l = exploded.select(col("doc").as("doc1"), col("harr").as("ha1"),
      col("band"), col("sig"))
    val r = exploded.select(col("doc").as("doc2"), col("harr").as("ha2"),
      col("band"), col("sig"))
    val firstCollidingBand = (0 until bands).map { bd =>
      val earlierDiffer = (0 until bd).map { e =>
        (0 until rowsPerBand)
          .map(rr => col("ha1")(e * rowsPerBand + rr) =!= col("ha2")(e * rowsPerBand + rr))
          .reduce(_ || _)
      }.foldLeft(lit(true))(_ && _)
      (col("band") === bd) && earlierDiffer
    }.reduce(_ || _)
    l.join(r, Seq("band", "sig"))
      .filter(col("doc1") < col("doc2"))
      .filter(firstCollidingBand)
      .select("doc1", "doc2")
  }

  /** 32-bit SimHash fingerprint from word tokens (md5-derived token
    * hashes so the oracle can reproduce it; production: xxhash64 + 64
    * bits). */
  def simhash32(df0: DataFrame, id: String, text: String): DataFrame = {
    val df = graft.engine.Core.spread(df0)
    val toks = df.select(col(id).as("doc"),
      explode(array_distinct(split(lower(trim(col(text))), "\\s+"))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = toks.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 32).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc"), fp.as("simhash"))
  }

  /** SimHash near-dup candidates: byte-band bucketing then hamming
    * distance <= maxHamming via bit_count(xor).
    *
    * Dedup across bands WITHOUT a distinct(): a pair is emitted only
    * from its FIRST colliding band (all earlier bands must differ, which
    * is checkable from the two fingerprints carried through the join).
    * On templated corpora where near-dup pairs are plentiful, this
    * replaces a multi-million-row distinct shuffle with a codegen'd
    * filter. */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   maxHamming: Int = 3): DataFrame = {
    val fps = simhash32(df, id, text)
    val banded = fps.select(col("doc"), col("simhash"),
      explode(array((0 until 4).map { byte =>
        struct(lit(byte).as("band"),
          shiftright(col("simhash"), byte * 8).bitwiseAND(0xff).as("key"))
      }: _*)).as("bk"))
      .select(col("doc"), col("simhash"), col("bk.band"), col("bk.key"))
      .localCheckpoint() // reused by both self-join sides
    val l = banded.select(col("doc").as("doc1"), col("simhash").as("f1"), col("band"), col("key"))
    val r = banded.select(col("doc").as("doc2"), col("simhash").as("f2"), col("band"), col("key"))
    def bandByte(c: Column, b: Int) = shiftright(c, b * 8).bitwiseAND(0xff)
    val firstCollidingBand = (0 until 4).map { b =>
      val earlierDiffer = (0 until b)
        .map(e => bandByte(col("f1"), e) =!= bandByte(col("f2"), e))
        .foldLeft(lit(true))(_ && _)
      (col("band") === b) && earlierDiffer
    }.reduce(_ || _)
    l.join(r, Seq("band", "key")).filter(col("doc1") < col("doc2"))
      .filter(firstCollidingBand)
      .select(col("doc1"), col("doc2"),
        bit_count(col("f1").bitwiseXOR(col("f2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.
    * `maxShingleDf` drops ubiquitous shingles before the join (skew
    * guard; also an LSH-free candidate cap).
    *
    * Plan shape: the set size rides ALONG with each exploded shingle row
    * (computed per doc before the explode), so no separate `sizes`
    * aggregation or join-back exists; and the shingle table is
    * `localCheckpoint`ed so the self-join's two branches (plus the
    * document-frequency filter) read one materialization instead of
    * re-running the shingle generation per branch — Spark duplicates
    * the subtree for every reference otherwise (observed 6 Generates). */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String, k: Int = 3,
                        minJaccard: Double = 0.8,
                        maxShingleDf: Int = 1000): DataFrame = {
    val docs = graft.engine.Core.spread(df)
      .select(col(id).as("doc"), shingleSetUdf(k)(words(col(text))).as("shl"))
    val sh = docs
      .select(col("doc"), size(col("shl")).as("sz"), explode(col("shl")).as("s"))
      .localCheckpoint()
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf).select("s")
    val filtered = sh.join(broadcast(hot), Seq("s"), "left_anti")
    filtered.select(col("doc").as("doc1"), col("sz").as("sz1"), col("s"))
      .join(filtered.select(col("doc").as("doc2"), col("sz").as("sz2"), col("s")),
        Seq("s"))
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2", "sz1", "sz2").agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc1", "doc2", "jaccard")
  }
}
