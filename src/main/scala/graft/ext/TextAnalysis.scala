package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for LLM training-data pipelines: tokenization,
 * language ID, quality scoring, token counting, fingerprinting.
 * (Extension layer — no reference counterpart; SURVEY.md §7.3.)
 *
 * All per-document features are pure Column algebra (codegen'd, one scan,
 * no UDFs) — per-row scalar math is bit-deterministic, so results are
 * oracle-comparable. Designed to run as a single projection over 100 TB:
 * no shuffle, no driver state.
 */
object TextAnalysis {

  /** Lowercased alphanumeric tokens; the same regex is used by the DuckDB
    * oracles (`string_split_regex`), so keep it RE2/ICU-portable. */
  val TokenSplitRegex = "[^a-z0-9]+"

  /** GPT-2-style pre-tokenizer shape: word pieces or single non-space
    * punctuation — the "BPE-ish" token count. */
  val BpeishRegex = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"

  /** Tiny English stopword list (shared with the oracle SQL). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "be", "by", "not")

  def tokens(text: Column): Column =
    filter(split(lower(text), TokenSplitRegex), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Whitespace-delimited token count. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= "")).cast("long")

  /** BPE-ish token count via the pre-tokenizer regex. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishRegex), lit(0))).cast("long")

  /** Word k-shingles: ["a","b","c","d"], k=3 → ["a b c","b c d"]. Empty
    * array when fewer than k tokens. */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** Fraction of characters that are neither alphanumeric nor whitespace. */
  def punctRatio(text: Column): Column = {
    val len = length(text).cast("double")
    when(len === 0, 0.0).otherwise(
      (len - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))) / len)
  }

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    when(n === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(Stopwords.map(lit): _*).cast("boolean"))).cast("double") / n)
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    when(n === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") / n)
  }

  /**
   * Heuristic language ID: Unicode-block rules for CJK/Kana/Cyrillic/
   * Greek/Arabic, accented-Latin hints for de/es/fr, else English when the
   * stopword profile matches, else "und". Rule-based (n-gram-profile style,
   * cf. Cavnar & Trenkle 1994) so it is deterministic and SQL-portable.
   */
  def langIdHeuristic(text: Column): Column = {
    def has(re: String): Column = text.rlike(re)
    // Kana before CJK: Japanese text usually mixes kanji with kana, so the
    // presence of kana is the stronger signal; kanji alone → Chinese.
    when(has("[\\u3040-\\u30ff]"), "ja")
      .when(has("[\\u4e00-\\u9fff]"), "zh")
      .when(has("[\\uac00-\\ud7af]"), "ko")
      .when(has("[\\u0400-\\u04ff]"), "ru")
      .when(has("[\\u0370-\\u03ff]"), "el")
      .when(has("[\\u0600-\\u06ff]"), "ar")
      .when(has("[äöüß]"), "de")
      .when(has("[ñ¿¡]"), "es")
      .when(has("[àâçèêëîïôùûœ]"), "fr")
      .when(stopwordRatio(text) >= 0.02, "en")
      .otherwise("und")
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * some stopwords, sane token lengths. Deterministic scalar math. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenOk = when(nTok >= 10 && nTok <= 10000, 1.0).otherwise(0.5)
    val punctOk = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) >= 0.01, 1.0).otherwise(0.5)
    val tokLen = avgTokenLen(text)
    val tokOk = when(tokLen >= 2.0 && tokLen <= 12.0, 1.0).otherwise(0.0)
    (lenOk * 0.3 + punctOk * 0.3 + stopOk * 0.2 + tokOk * 0.2)
  }

  /** One-scan feature projection over a documents table. */
  def qualityFeatures(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars_actual"),
      tokenCount(t).as("n_tokens"),
      wsTokenCount(t).as("n_ws_tokens"),
      bpeishTokenCount(t).as("n_bpeish_tokens"),
      punctRatio(t).as("punct_ratio"),
      stopwordRatio(t).as("stopword_ratio"),
      avgTokenLen(t).as("avg_token_len"),
      langIdHeuristic(t).as("lang_pred"),
      qualityScore(t).as("quality"))
  }
}
