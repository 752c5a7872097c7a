package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * quality scoring, language-ID, fingerprinting. All per-row Column
  * expressions (codegen'd, embarrassingly parallel — no shuffles, no UDFs),
  * so they cost one narrow scan at any scale.
  *
  * Numeric outputs are built from a fixed double-arithmetic expression tree
  * mirrored exactly by the DuckDB oracle SQL, so results are bit-identical.
  */
object TextFunctions {

  def words(text: Column): Column = split(text, "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token count: letter runs, single digits, single punctuation
    * marks — a cheap stand-in for subword tokenizers with the same regex in
    * both engines.
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(expr_regexp_extract_all(text, BpePattern))

  private def expr_regexp_extract_all(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(0))

  /** Punctuation ratio: non-alphanumeric-non-space chars / total chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      length(text).cast("double")

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val stop = array(Stopwords.map(lit): _*)
    size(filter(words(text), w => array_contains(stop, w))).cast("double") /
      size(words(text)).cast("double")
  }

  /** Mean token length in characters. */
  def meanWordLen(text: Column): Column =
    aggregate(words(text), lit(0L), (acc, w) => acc + length(w)).cast("double") /
      size(words(text)).cast("double")

  /** Composite quality score in [0,1]: length saturation, low punctuation,
    * stopword presence, word-length saturation. Fixed weights; the formula
    * is the contract, not a learned model.
    */
  def qualityScore(text: Column): Column =
    lit(0.3) * least(lit(1.0), tokenCount(text).cast("double") / lit(100.0)) +
      lit(0.3) * (lit(1.0) - punctRatio(text)) +
      lit(0.2) * stopwordRatio(text) +
      lit(0.2) * least(lit(1.0), meanWordLen(text) / lit(8.0))

  /** Tiny per-language marker profiles for the n-gram/stopword language-ID
    * heuristic. Deterministic scoring: hits per profile, ties broken by the
    * fixed language order below.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("de", "shi", "he", "zai", "you", "wo"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangProfiles.map { case (lang, profile) =>
      val p = array(profile.map(lit): _*)
      lang -> size(filter(words(text), w => array_contains(p, w)))
    }

  /** Predicted language: argmax score, first-listed language wins ties. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    scores.zipWithIndex.foldRight(lit("und")) { case (((lang, s), i), els) =>
      val laterBeats = scores.drop(i + 1).map(_._2)
      val isMax = laterBeats.foldLeft(lit(true))((acc, o) => acc && s >= o)
      when(isMax && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Content fingerprint: md5 of the normalized token stream (exact-dup
    * detection at scale — group by fingerprint instead of full text).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", words(lower(text))))

  /** Rolling polynomial fingerprint over token hashes — order-sensitive,
    * cheap to maintain incrementally: fold(acc*31 + hash60(w)) mod 1e9+7.
    */
  val RollPrime = 1000000007L
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(words(text), w => Portable.hash60(w)),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(RollPrime)))
}
