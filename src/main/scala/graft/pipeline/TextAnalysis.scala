package graft.pipeline

import org.apache.spark.sql.Column
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

  /** Order-sensitive rolling-hash fingerprint (Rabin-Karp-style
    * polynomial fold over the token stream) — distinguishes documents
    * that are permutations of the same token bag, which [[fingerprint]]
    * by design does not. Native codegen expression
    * ([[graft.functions.RollingHash]]); map-side, zero shuffle. */
  def rollingFingerprint(c: Column): Column =
    graft.functions.RollingHash(tokens(c))
}
