package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale document pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything except the fingerprint/langid kernels is pure Catalyst
  * built-ins (codegen'd, pushdown-friendly). The kernels are deterministic
  * Scala UDFs over a single string column — no state, no shuffle.
  */
object Text {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Count of characters matching a regex character class. */
  def charClassCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  def punctCount(text: Column): Column = charClassCount(text, "[.,;:!?]")

  /** A BPE-ish token estimate: word-pieces + digits + punctuation runs,
    * approximating how a byte-pair tokenizer segments text.
    */
  def bpeTokenCount(text: Column): Column = {
    val pieces = regexp_extract_all(
      text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"), lit(0))
    size(pieces)
  }

  /** Stopword hits: occurrences of common English stopwords as whole,
    * lowercased words.
    */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "was",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "or")

  def stopwordCount(text: Column): Column = {
    val pat = EnglishStopwords.mkString("\\b(", "|", ")\\b")
    size(regexp_extract_all(lower(text), lit(pat), lit(0)))
  }

  /** Composite quality features (one struct column):
    * n_tokens, n_chars, punct_ratio, stopword_ratio, mean_token_len.
    * Ratios are single divisions over the same integers on any engine —
    * bit-deterministic, oracle-safe.
    */
  def qualityFeatures(text: Column): Column = {
    val nTok = tokenCount(text)
    val nCh = length(text)
    struct(
      nTok.as("n_tokens"),
      nCh.as("n_chars"),
      when(nCh === 0, 0.0)
        .otherwise(punctCount(text).cast("double") / nCh.cast("double"))
        .as("punct_ratio"),
      when(nTok === 0, 0.0)
        .otherwise(stopwordCount(text).cast("double") / nTok.cast("double"))
        .as("stopword_ratio"),
      when(nTok === 0, 0.0)
        .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") /
          nTok.cast("double"))
        .as("mean_token_len"))
  }

  /** Scalar quality score in [0,1]: rewards stopword presence and sane
    * token lengths, penalizes punctuation soup. Deterministic arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val stopComp = least(f("stopword_ratio") * 2.5, lit(1.0))
    val punctComp = greatest(lit(1.0) - f("punct_ratio") * 5.0, lit(0.0))
    val lenComp = when(f("mean_token_len").between(3.0, 9.0), 1.0)
      .otherwise(0.5)
    round((stopComp + punctComp + lenComp) / 3.0, 6)
  }

  // --- language ID (n-gram + stopword heuristic) -----------------------

  /** Per-language marker words (high-frequency function words that are
    * near-unique to each language among this set).
    */
  private val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "con", "por", "para"),
    "it" -> Seq("il", "di", "che", "non", "per", "del", "sono", "una"))

  /** Best-scoring language code, or "und" when no marker hits. */
  def langId(text: Column): Column = {
    val markerScores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val pat = words.mkString("\\b(", "|", ")\\b")
      val n = size(regexp_extract_all(lower(text), lit(pat), lit(0)))
      struct(n.as("score"), lit(lang).as("lang"))
    }
    // CJK scripts have no spaces/stopwords: score zh by han-char count
    val zh = struct(
      size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
        .as("score"),
      lit("zh").as("lang"))
    val scores = markerScores :+ zh
    // array_max on (score, lang) structs: ties break to the *largest* lang
    // code, deterministic on every engine.
    val best = array_max(array(scores: _*))
    when(best("score") === 0, lit("und")).otherwise(best("lang"))
  }

  // --- fingerprinting ---------------------------------------------------

  /** Polynomial rolling hash (base 31, native Long overflow) of the
    * normalized text (lowercased, whitespace collapsed). Identical
    * normalized content ⇒ identical fingerprint; usable as an exact-dup
    * key that is cheaper to shuffle than the full text.
    */
  def fingerprint(text: Column): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    fingerprintOfNormalized(norm)
  }

  def fingerprintOfNormalized(norm: Column): Column =
    TextKernelExprs.polyHash(norm)
}
