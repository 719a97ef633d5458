package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, language-ID (stopword-marker heuristic), quality features,
  * and document fingerprinting (polynomial rolling hash).
  *
  * Everything here is built from codegen'd Catalyst built-ins (split /
  * filter / transform / aggregate higher-order functions) — no Scala UDFs —
  * so the expressions stay inside whole-stage codegen and are safe to run
  * over billions of documents.
  */
object Text {

  /** Marker stopwords per language, used by the language-ID heuristic.
    * Order matters: it is the deterministic tie-break (first max wins). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "se", "un", "por", "con"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "et", "les", "des", "une", "dans", "est", "pour", "qui", "sur"),
    "pt" -> Seq("o", "os", "do", "da", "em", "um", "para", "com", "uma", "por"))

  /** Whitespace tokenization (the corpus is space-separated). */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Number of tokens that appear in `words`. */
  def markerHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(words)))

  /** Per-language marker-hit scores. */
  def langScores(c: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) => lang -> markerHits(c, words) }

  /** Language-ID: argmax of marker-hit scores, 'und' when no marker hits.
    * Ties break to the first language in `LangMarkers` order. */
  def langId(c: Column): Column = {
    val scores = langScores(c)
    val m = greatest(scores.map(_._2): _*)
    val chain = scores.foldRight(lit("und")) { case ((lang, sc), els) =>
      when(sc === m, lit(lang)).otherwise(els)
    }
    when(m === 0, lit("und")).otherwise(chain)
  }

  /** Fraction of tokens that are distinct — low values indicate boilerplate
    * / repetitive spam. Exact double division of two ints (deterministic). */
  def distinctTokenRatio(c: Column): Column = {
    val toks = tokens(c)
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")
  }

  /** Fraction of tokens that are language markers (any language). */
  def stopwordRatio(c: Column): Column = {
    val all = LangMarkers.flatMap(_._2).distinct
    markerHits(c, all).cast("double") / tokenCount(c).cast("double")
  }

  /** Mean token length in characters (spaces excluded). */
  def meanTokenLength(c: Column): Column = {
    val nTok = tokenCount(c)
    (length(c) - (nTok - lit(1))).cast("double") / nTok.cast("double")
  }

  /** Polynomial rolling hash over the document's characters:
    * fp = fold(0, acc * 31 + codePoint) mod 1e9+7. Native codegen'd
    * expression ([[RollingHashLong]]) — the per-character fold is the
    * whole cost of fingerprinting a corpus, so it must not run on the
    * interpreted higher-order-function path. The modulus keeps every
    * intermediate below 2^35 so the arithmetic is exact in both Spark and
    * any BIGINT-based oracle. Empty input → 0.
    */
  def charFingerprint(c: Column): Column = RollingHashLong.rolling_hash(c)

  /** Tiny polarity lexicons for lexicon-based sentiment scoring (the
    * classic distributed-sentiment baseline; swap in a real lexicon for
    * production). Order-stable constants shared with generated oracle
    * SQL. */
  val PositiveMarkers: Seq[String] =
    Seq("fast", "good", "great", "small", "new", "best", "quick")
  val NegativeMarkers: Seq[String] =
    Seq("slow", "bad", "big", "old", "worst", "error", "broken")

  /** Lexicon polarity score in [-1, 1]: (pos hits − neg hits) / tokens.
    * Exact rational of integer counts — deterministic across engines. */
  def sentimentScore(c: Column): Column =
    (markerHits(c, PositiveMarkers) - markerHits(c, NegativeMarkers))
      .cast("double") / tokenCount(c).cast("double")

  /** Canonicalization for dedup: lowercase, strip non-alphanumerics
    * (keeping spaces), collapse runs of whitespace, trim. Two documents
    * differing only in case/punctuation/spacing normalize identically —
    * run BEFORE exact or near dedup to catch trivial variants. */
  def normalizeForDedup(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9\\s]", ""),
      "\\s+", " "))

  /** PII patterns for training-data scrubbing. Kept to syntax valid in
    * BOTH Java regex (Spark) and RE2 (DuckDB oracle): no backrefs, no
    * lookaround. Email first, then phone — order matters when one string
    * could match both.
    *
    * Recall-first by design: the phone pattern matches ANY 8+ character
    * digit run with phone separators, so dates and numeric ids get
    * redacted too. Without lookaround (RE2 has none) a regex cannot
    * separate "2023-04-13 18:04" from a phone number; a privacy-first
    * scrubber prefers over-redaction, and callers needing precision layer
    * a validator on top.
    *
    * The separator class spells whitespace out as [\t\n\f\r ] instead of
    * \s — Java's \s includes \x0B (vertical tab), RE2's does not, and a
    * shorthand whose SEMANTICS differ between the engine and the oracle
    * is a hash mismatch waiting for the right document. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\-\\t\\n\\f\\r ]{6,}[0-9]"

  /** Email-only scrub step — shared by [[scrubPii]] and the n_pii phone
    * count (which must run on exactly this intermediate text). */
  def scrubEmails(c: Column): Column =
    regexp_replace(c, EmailPattern, "<email>")

  /** Redact emails then phone-like sequences. The replacement tokens keep
    * the document tokenizable (single tokens, no whitespace). */
  def scrubPii(c: Column): Column =
    regexp_replace(scrubEmails(c), PhonePattern, "<phone>")

  /** Token n-gram shingles (distinct), the unit of near-dup comparison.
    * Documents shorter than n tokens yield an empty set; NULL text too
    * (parity with the original HOF form, whose `when` fell through to
    * the empty-array branch on a null size). Backed by the native
    * [[TokenShingles]] expression — the HOF form interpreted its
    * lambdas per gram, which made shingling the hot loop under the
    * whole near-dup family. */
  def shingles(c: Column, n: Int): Column =
    coalesce(TokenShingles.token_shingles(c, n),
      array().cast("array<string>"))

  /** Non-distinct token n-gram occurrences (repetition statistics). */
  def ngrams(c: Column, n: Int): Column =
    coalesce(TokenShingles.token_ngrams(c, n),
      array().cast("array<string>"))
}
