package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is composed from codegen'd Catalyst expressions (no UDFs),
  * so these run inside WholeStageCodegen directly over the parquet scan —
  * at 100 TB these are embarrassingly parallel map-side ops with zero
  * shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token estimate: alpha runs, digit runs, and isolated
    * punctuation each count as one token. */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Explicit ASCII punctuation class — identical semantics in Java regex
    * and RE2 (the oracle engine), unlike \p{Punct}. */
  val PunctClass = "[!-/:-@\\[-`{-~]"

  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, PunctClass, ""))

  def punctRatio(c: Column): Column =
    when(length(c) > 0, punctCount(c).cast("double") / length(c)).otherwise(0.0)

  def meanWordLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
  }

  def stopwordRatio(c: Column, stops: Seq[String]): Column = {
    val t = tokens(c)
    val hits = size(filter(t, x => array_contains(typedLit(stops), x)))
    when(size(t) > 0, hits.cast("double") / size(t)).otherwise(0.0)
  }

  val EnStops: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "on", "for", "with", "as", "at", "by")

  /** Composite quality score in [0,1]: length band + low punctuation +
    * stopword presence + word-length sanity. Deterministic, SQL-mirrored
    * by the oracle. */
  def qualityScore(c: Column): Column = {
    val lenOk = when(length(c).between(50, 5000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(c) < 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(c, EnStops) > 0.02, 1.0).otherwise(0.0)
    val wordOk = when(meanWordLen(c).between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk + punctOk + stopOk + wordOk) / 4.0
  }

  /** n-gram-heuristic language ID: score per language = stopword-hit
    * ratio; argmax wins, 'und' when nothing scores. */
  val LangStops: Seq[(String, Seq[String])] = Seq(
    "en" -> EnStops,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "de", "que"))
  def langId(c: Column): Column = {
    val scored = LangStops.map { case (lang, stops) =>
      struct(stopwordRatio(c, stops).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0.0, best.getField("lang")).otherwise("und")
  }

  /** Canonical document fingerprint: md5 of the sorted distinct token
    * set — robust to token order and duplication (the "sorted bag"
    * fingerprint); md5 keeps it oracle-comparable, swap `xxhash64` for
    * cheaper production hashing. */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))

  /** TF-IDF + BM25 top-`k` terms per document — the scoring kernel for
    * corpus search / keyword extraction over a training set.
    *
    * Scores (both emitted per surviving term):
    *   - tfidf = tf · (ln((N+1)/(df+1)) + 1)        (sklearn smoothing)
    *   - bm25  = idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    *     idf = ln((N−df+0.5)/(df+0.5) + 1)           (Okapi, Lucene form)
    *
    * Plan shape at 100 TB: the corpus is tokenized ONCE — the (doc,
    * term) explode + hash aggregate is a single exchange subtree that
    * every downstream consumer (document frequency, the corpus-scalar
    * probe, the scoring join) references verbatim, so ReuseExchange
    * materializes its shuffle files once; no checkpoint, no second
    * tokenizer pass. Doc length is the sum of term counts over the
    * SAME doc-id partitioning the top-k ranking already shuffles on
    * (two Window ops, one shuffle), never a recomputed higher-order
    * filter over the raw text — the round-5 form carried
    * `size(filter(tokens))` through the aggregate as a group key,
    * which falls out of whole-stage codegen AND re-evaluates per
    * exploded row. Document frequency is a vocabulary-sized
    * re-aggregate on the term (hash-partitioned, never broadcast);
    * the two global scalars (N, avg doc length) derive from the same
    * tf table (distinct docs, total tokens) and ride a broadcast
    * 1-row aggregate. Everything is a pure function of the corpus —
    * rerun-stable and oracle-exact. */
  def bm25TopTerms(df: DataFrame, id: String, text: String, k: Int = 3,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = graft.engine.Core.spread(df.select(col(id), col(text)))
      .select(col(id), explode(tokens(col(text))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(id), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfTab = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    // N = docs with >= 1 token, avgdl = total tokens / N — same values
    // the doc-table scan produced, but derived from tf so the explode's
    // exchange is reused instead of a second tokenizer pass
    val stats = tf.agg(
      countDistinct(col(id)).cast("double").as("__n"),
      sum(col("tf")).as("__tok"))
      .select(col("__n"), (col("__tok") / col("__n")).as("__avgdl"))
    val wDoc = Window.partitionBy(col(id))
    val scored = tf
      .join(dfTab, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__dl", sum(col("tf")).over(wDoc))
    val idf = log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
    val tfidf = col("tf") * (log((col("__n") + 1.0) / (col("__df") + 1.0)) + 1.0)
    val bm25 = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl")))
    val wRank = Window.partitionBy(col(id)).orderBy(bm25.desc, col("term"))
    scored
      .withColumn("tfidf", tfidf)
      .withColumn("bm25", bm25)
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col(id), col("term"), col("tf").cast("long").as("tf"),
        col("tfidf"), col("bm25"), col("rank"))
  }

  /** CCNet-style perplexity proxy: score each document by the average
    * negative log-probability of its tokens under the corpus's own
    * unigram distribution. Low = made of common words (boilerplate-ish),
    * high = rare-token-heavy (noise, mojibake, tables) — the standard
    * head/middle/tail quality split is quantiles of this score.
    *
    * Plan shape at 100 TB: per-(doc, term) counts hash-aggregate
    * map-side-combinably; the vocabulary join is hash-partitioned
    * (never broadcast — vocabularies are corpus-sized); the corpus
    * total rides a broadcast 1-row aggregate; one final doc-keyed
    * aggregate. No OOV smoothing is needed: every token is by
    * construction in the vocabulary it is scored against. */
  def unigramLogProb(df: DataFrame, id: String, text: String): DataFrame = {
    val dt = graft.engine.Core.spread(df.select(col(id), col(text)))
      .select(col(id), explode(tokens(col(text))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("__k"))
    // the vocabulary roll-up and the scoring join reference this exact
    // aggregate subtree, so ReuseExchange materializes its shuffle once
    // (same pattern as bm25TopTerms — no checkpoint needed)
    val tf = dt.groupBy(col("term")).agg(sum(col("__k")).as("__c"))
    val tot = tf.agg(sum(col("__c")).cast("double").as("__tot"))
    dt.join(tf, Seq("term"))
      .crossJoin(broadcast(tot))
      .groupBy(col(id))
      .agg(sum(col("__k")).as("n_tokens"),
        (-sum(col("__k") * log(col("__c").cast("double") / col("__tot"))) /
          sum(col("__k"))).as("avg_neg_logprob"))
  }

  /** Order-sensitive rolling-hash fingerprint (Rabin-Karp-style
    * polynomial fold over the token stream) — distinguishes documents
    * that are permutations of the same token bag, which [[fingerprint]]
    * by design does not. Native codegen expression
    * ([[graft.functions.RollingHash]]); map-side, zero shuffle. */
  def rollingFingerprint(c: Column): Column =
    graft.functions.RollingHash(tokens(c))

  /** Non-empty tokens as an array column (shared by the n-gram ops). */
  private def cleanTokens(text: Column): Column =
    filter(tokens(text), t => t =!= "")

  /** Corpus-wide top-k token n-grams by frequency (vocabulary /
    * tokenizer-training prep, boilerplate discovery). Deterministic
    * tie-break: count desc, then gram asc.
    *
    * Scale shape: the n-gram explode is map-side (no per-doc state);
    * the count is a map-side-combinable hash aggregate keyed on the
    * gram — a boilerplate gram repeated a billion times collapses to
    * one row per map task before the shuffle — and the top-k compiles
    * to TakeOrderedAndProject (each task keeps k rows, driver merges
    * k·partitions; the gram table is never globally sorted). */
  def topNgrams(df: DataFrame, text: String, n: Int = 2,
                k: Int = 20): DataFrame = {
    require(n >= 1 && k >= 1, s"need n>=1, k>=1; got $n, $k")
    val w = cleanTokens(col(text))
    val grams =
      when(size(w) >= n, transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    graft.engine.Core.spread(df.select(col(text)))
      .select(explode(grams).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }

  /** Interpolated-bigram language-model score per document: the average
    * over positions i >= 2 of ln(λ·P(wᵢ|wᵢ₋₁) + (1-λ)·P(wᵢ)), with
    * both models estimated from the corpus itself (the KenLM-shaped
    * refinement of [[unigramLogProb]] — bigram structure separates
    * fluent text from shuffled-word noise that unigram statistics
    * cannot see). The unigram interpolation term doubles as OOV-free
    * smoothing: every bigram's components exist in the corpus
    * vocabulary by construction, so the argument of ln is never 0.
    *
    * Scale shape: TWO corpus scans, ONE raw-pair shuffle, everything
    * else vocabulary-sized. The per-position explode emits, per doc, a
    * `(prev="", cur=w₁)` sentinel row plus the real bigram rows — the
    * sentinel is a value `cleanTokens` can never produce (empties are
    * dropped), and both key columns are `coalesce`d non-nullable so
    * Catalyst infers no IsNotNull join filters that would fork the
    * subtrees. Scan 1 feeds `big = count by (prev, cur)` directly —
    * partial aggregation combines map-side, so its exchange moves
    * DISTINCT bigrams, never the raw pair stream. The unigram table and
    * corpus total then derive from `big` itself (every token appears
    * exactly once as `cur`, sentinels included), i.e. vocabulary-sized
    * re-aggregation, not another corpus pass. The score
    * ln(λ·bc/c(prev) + (1-λ)·c(cur)/tot) is a function of the bigram
    * alone, so it is computed on the vocab-sized `big` (two vocab⋈vocab
    * hash joins; sentinel rows drop by non-match — no filter needed);
    * scan 2's pair stream joins that scored table exactly once (the
    * sole raw-pair shuffle; AQE broadcasts the scored side when small)
    * and partial-aggregates map-side into the per-doc average. Docs
    * with < 2 tokens drop out (no bigrams), as in pandas/KenLM
    * practice; their tokens still count toward the unigram model via
    * the sentinel rows. */
  def bigramLogProb(df: DataFrame, id: String, text: String,
                    lambda: Double = 0.7): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, s"need 0 < lambda <= 1; got $lambda")
    val w = cleanTokens(col(text))
    // i=1 → sentinel (prev=""); i>=2 → bigram (w[i-1], w[i]).
    // coalesce: element_at is nullable in the schema even though tokens
    // never are; non-nullable keys keep inferred IsNotNull filters out
    // of every consumer subtree.
    def tokRows(src: DataFrame): DataFrame = src
      .select(col(id), w.as("__w"))
      .filter(size(col("__w")) >= 1)
      .select(col(id), explode(transform(sequence(lit(1), size(col("__w"))),
        i => struct(
          coalesce(when(i > 1, element_at(col("__w"), i - 1)), lit(""))
            .as("prev"),
          coalesce(element_at(col("__w"), i), lit("")).as("cur")))).as("__p"))
      .select(col(id), col("__p.prev").as("prev"), col("__p.cur").as("cur"))
    val src = graft.engine.Core.spread(df.select(col(id), col(text)))
    val big = tokRows(src).groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).cast("double").as("__bc"))
    // every corpus token appears exactly once as `cur` in the pair
    // stream (sentinels carry the first tokens), so unigram counts and
    // the corpus total are re-aggregations of vocab-sized `big`
    val uni = big.groupBy(col("cur")).agg(sum(col("__bc")).as("__uc"))
    val tot = uni.agg(sum(col("__uc")).as("__tot"))
    // double-op order mirrors the oracle exactly:
    // (λ·bc)/uc_prev + ((1-λ)·uc_cur)/total
    val lp = log(
      (lit(lambda) * col("__bc")) / col("__pc") +
        (lit(1.0 - lambda) * col("__cc")) / col("__tot"))
    val bigScored = big
      .join(uni.select(col("cur").as("prev"), col("__uc").as("__pc")),
        Seq("prev"))  // sentinel prev="" never matches a token → drops
      .join(uni.select(col("cur"), col("__uc").as("__cc")), Seq("cur"))
      .crossJoin(broadcast(tot))
      .select(col("prev"), col("cur"), lp.as("__lp"))
    tokRows(src)
      .join(bigScored, Seq("prev", "cur"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("avg_lp"))
  }

  // ---- BPE tokenizer training (round 8) ------------------------------

  /** Token-stream encoding for the BPE loop: every character becomes a
    * `·`-wrapped token (`ab` -> `·a··b·`), so a merge (l, r) is the
    * plain string replacement `·l··r·` -> `·lr·` — non-overlapping
    * left-to-right in both Spark and DuckDB, which is exactly BPE's
    * greedy merge order, and boundary-safe (a pattern can never match a
    * token prefix/suffix because each token carries BOTH its wrapping
    * separators). The separator must not occur in the corpus (the
    * synthetic documents are [a-z ]). */
  private val Sep = "·"

  private def wrapped(text: Column): Column =
    regexp_replace(text, "(.)", s"$Sep$$1$Sep")

  private def tokensOf(t: Column): Column =
    split(trim(t, Sep), s"$Sep$Sep")

  /** Byte-pair-encoding trainer — the Sennrich et al. (2016) WORD-
    * HISTOGRAM formulation: merges never cross word boundaries, so the
    * loop runs over the (word, count) table, which Heaps' law keeps
    * orders of magnitude under the corpus. The plan:
    *
    *   - ONE corpus pass builds the histogram (word explode + hash
    *     aggregate) and persists it;
    *   - each of `numMerges` rounds is a VOCAB-sized job: pair explode
    *     weighted by word count, combinable sum aggregate, a 1-row
    *     argmax collect (the merge rule IS the model — driver-sized by
    *     definition), then a literal replacement over the histogram.
    *
    * Ties break (count desc, lhs, rhs) — total and reproducible
    * (binary ASCII order here and in the SQL oracle). Returns
    * (merge_idx, lhs, rhs, freq). At 100 TB the corpus is touched
    * exactly once; the loop cost is independent of corpus size. */
  def bpeTrain(df: DataFrame, id: String, text: String,
               numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var cur = df
      .select(explode(split(col(text), " +")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .select(wrapped(col("__w")).as("__t"), col("__n"))
      .persist(lvl)
    val merges = collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var prev: DataFrame = null
    for (i <- 1 to numMerges) {
      val toks = tokensOf(col("__t"))
      val pairs = cur
        .select(toks.as("__tk"), col("__n"))
        .filter(size(col("__tk")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("__tk")) - 1),
          j => struct(element_at(col("__tk"), j).as("l"),
            element_at(col("__tk"), j + 1).as("r")))).as("p"), col("__n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("__n")).as("c"))
      val top = pairs.orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (prev != null) prev.unpersist()
      if (top.isEmpty) {
        prev = null
      } else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((i, l, r, c))
        prev = cur
        cur = cur.withColumn("__t",
          call_function("replace", col("__t"),
            lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep$l$r$Sep")))
          .persist(lvl)
      }
    }
    cur.unpersist()
    if (prev != null) prev.unpersist()
    merges.toSeq.toDF("merge_idx", "lhs", "rhs", "freq")
  }

  /** Apply a learned merge list, WORD-BASED like the trainer: the text
    * splits on ' +', each word is encoded independently (merges never
    * cross word boundaries — Sennrich BPE), and n_tokens is the SUM of
    * per-word token counts, so spaces are never counted as tokens and
    * an empty document is 0 tokens. The whole thing is one chain of
    * higher-order array expressions over a literal merge list — pure
    * map-side codegen, zero shuffle. */
  def bpeApply(df: DataFrame, id: String, text: String,
               merges: Seq[(String, String)]): DataFrame = {
    def encode(w: Column): Column =
      merges.foldLeft(wrapped(w)) { case (t, (l, r)) =>
        call_function("replace", t,
          lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep$l$r$Sep"))
      }
    val words = filter(split(col(text), " +"), w => w =!= "")
    df.select(col(id).cast("long").as(id),
      // null text counts 0 tokens like an empty doc (the DuckDB
      // oracle's coalesce does the same)
      coalesce(aggregate(words, lit(0L),
        (acc, w) => acc + size(tokensOf(encode(w))).cast("long")),
        lit(0L)).as("n_tokens"))
  }
}
