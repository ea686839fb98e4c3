package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text analysis for large-scale training-data pipelines: token counting,
 * quality scoring, language-ID heuristics, document fingerprinting.
 *
 * Everything is a built-in Catalyst `Column` expression (whole-stage codegen,
 * no UDFs) except the native rolling-hash expression in graft.functions.
 * Oracle-parity notes: whitespace tokenisation is single-space split (matches
 * DuckDB string_split); ratios are integer-count / integer-length divisions
 * (IEEE-exact in both engines).
 */
object TextAnalysis {

  /** Tokens = whitespace fields of the NORMALIZED text (lowercase, trimmed,
    * runs of whitespace collapsed — [[Dedup.normalized]]): doubled spaces
    * must not mint empty tokens that deflate every ratio, and "The" at a
    * sentence start is the same token as "the". `size` returns -1 for a null
    * list under Spark's legacy sizeOfNull — nullif keeps null text null
    * (matching the SQL oracle's natural NULL) instead of scoring
    * stopwordRatio (-1)/(-1) = 1.0 for an empty document. */
  private def tokens(text: Column): Column = split(Dedup.normalized(text), " ")

  /** Whitespace token count over the normalized text. */
  def wsTokenCount(text: Column): Column = nullif(size(tokens(text)), lit(-1))

  /** BPE-ish token count: word pieces = letter runs, digit runs, single
    * non-alnum marks (a cheap proxy for BPE pre-tokenisation). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Punctuation character ratio over total length. */
  def punctRatio(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[.,!?;:']", ""))
    // nullif denominator: Spark's non-ANSI 0/0 is NaN while SQL division by
    // zero is NULL — an empty document must read the same in both engines
    punct.cast(DoubleType) / nullif(length(text).cast(DoubleType), lit(0.0))
  }

  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Count of stopword tokens (exact match on the normalized token split —
    * markers are lowercase, so matching must be too). */
  def stopwordCount(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    nullif(size(filter(tokens(text), t => t.isin(stopwords.map(lit(_)): _*))), lit(-1))

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordCount(text, stopwords).cast(DoubleType) / wsTokenCount(text).cast(DoubleType)

  /**
   * Composite quality score in [0,1] — length band + stopword presence + low
   * punctuation noise (the usual cheap pre-filter for web-scraped corpora).
   */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(64, 100000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) > 0.01, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    (lenOk * 0.4 + stopOk * 0.4 + punctOk * 0.2)
  }

  /** Marker words per language for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "que", "de", "es"),
    "fr" -> Seq("le", "et", "les", "est"))

  /** Score = marker-token count; guess = argmax language (ties → name order). */
  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.toSeq.sortBy(_._1).map { case (l, ws) => l -> stopwordCount(text, ws) }

  def langGuess(text: Column): Column = {
    val scored = langScores(text)
    // greatest-by with deterministic tie-break on language name order
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestL, bestS), (l, s)) =>
        (when(s > bestS, lit(l)).otherwise(bestL),
          when(s > bestS, s).otherwise(bestS))
    }._1
    // NULL text → NULL guess, like every other stat column: the fold's
    // comparisons are all null (never true) on a null text, so the seed
    // literal — a confident "de" for a document that doesn't exist — would
    // leak out otherwise
    when(text.isNull, lit(null).cast("string")).otherwise(best)
  }

  /** Normalised-text fingerprint (md5 — portable to any SQL oracle). Shares
    * [[Dedup.normalized]] so the stats fingerprint and the dedup fingerprint
    * cannot drift. */
  def fingerprint(text: Column): Column = md5(Dedup.normalized(text))

  /** Native rolling-hash fingerprint (codegen'd Catalyst expression). */
  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash.rolling_hash(lower(trim(text)))

  /** Full stats frame over a document table. */
  def stats(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(
      col(idCol),
      wsTokenCount(col(textCol)).as("ws_tokens"),
      length(col(textCol)).as("n_chars_computed"),
      punctRatio(col(textCol)).as("punct_ratio"),
      stopwordCount(col(textCol)).as("stopwords"),
      qualityScore(col(textCol)).as("quality"),
      langGuess(col(textCol)).as("lang_guess"),
      fingerprint(col(textCol)).as("fingerprint"))
}
