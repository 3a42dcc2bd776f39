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

  /** Lowercased word k-shingles of a text column. */
  def shingles(c: Column, k: Int): Column = {
    val words = split(lower(trim(c)), "\\s+")
    when(size(words) >= k,
      transform(sequence(lit(0), size(words) - k),
        i => concat_ws(" ", slice(words, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", words)))
  }

  /** Exact dedup: keep the lowest id per identical text; report group
    * size. Hashing the text first keeps shuffle rows narrow (32-byte key
    * instead of whole documents). */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), md5(col(text)).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))
      .drop("__h")

  /** One MinHash value: min over shingles of md5(seed || shingle) —
    * each seed is an independent permutation approximation. */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$seed:"), s))))

  /** MinHash signature as (bands x rowsPerBand) concatenated band keys. */
  def bandKeys(c: Column, k: Int, bands: Int, rowsPerBand: Int): Column = {
    val sh = array_distinct(shingles(c, k))
    val keys = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => minhash(sh, b * rowsPerBand + r))
      concat_ws("|", hs: _*)
    }
    array(keys.zipWithIndex.map { case (kcol, i) =>
      struct(lit(i).as("band"), kcol.as("sig"))
    }: _*)
  }

  /** LSH candidate pairs: docs sharing any band signature. */
  def minhashLshPairs(df: DataFrame, id: String, text: String,
                      k: Int = 3, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val exploded = df
      .select(col(id).as("doc"), explode(bandKeys(col(text), k, bands, rowsPerBand)).as("bk"))
      .select(col("doc"), col("bk.band"), col("bk.sig"))
    val l = exploded.select(col("doc").as("doc1"), col("band"), col("sig"))
    val r = exploded.select(col("doc").as("doc2"), col("band"), col("sig"))
    l.join(r, Seq("band", "sig"))
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
  }

  /** 32-bit SimHash fingerprint from word tokens (md5-derived token
    * hashes so the oracle can reproduce it; production: xxhash64 + 64
    * bits). */
  def simhash32(df: DataFrame, id: String, text: String): DataFrame = {
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
    * distance <= maxHamming via bit_count(xor). */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   maxHamming: Int = 3): DataFrame = {
    val fps = simhash32(df, id, text)
    val banded = fps.select(col("doc"), col("simhash"),
      explode(array((0 until 4).map { byte =>
        struct(lit(byte).as("band"),
          shiftright(col("simhash"), byte * 8).bitwiseAND(0xff).as("key"))
      }: _*)).as("bk"))
      .select(col("doc"), col("simhash"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("doc").as("doc1"), col("simhash").as("f1"), col("band"), col("key"))
    val r = banded.select(col("doc").as("doc2"), col("simhash").as("f2"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("f1").bitwiseXOR(col("f2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.
    * `maxShingleDf` drops ubiquitous shingles before the join (skew
    * guard; also an LSH-free candidate cap). */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String, k: Int = 3,
                        minJaccard: Double = 0.8,
                        maxShingleDf: Int = 1000): DataFrame = {
    val sh = df.select(col(id).as("doc"),
      explode(array_distinct(shingles(col(text), k))).as("s"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val filtered = sh.join(
      sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxShingleDf)
        .select("s"), Seq("s"))
    val common = filtered.select(col("doc").as("doc1"), col("s"))
      .join(filtered.select(col("doc").as("doc2"), col("s")), Seq("s"))
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
    common
      .join(sizes.select(col("doc").as("doc1"), col("sz").as("sz1")), Seq("doc1"))
      .join(sizes.select(col("doc").as("doc2"), col("sz").as("sz2")), Seq("doc2"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc1", "doc2", "jaccard")
  }
}
