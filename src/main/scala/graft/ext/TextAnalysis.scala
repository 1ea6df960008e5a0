package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Text-analysis operators for LLM training-data pipelines: tokenization,
 * language ID, quality scoring, token counting, fingerprinting.
 * (Extension layer — no reference counterpart; SURVEY.md §7.3.)
 *
 * Per-document features are deterministic scalar math over one text scan —
 * no shuffle, no driver state — so the whole feature projection runs as a
 * single codegen'd pass over 100 TB. Tokenization is the custom
 * [[graft.functions.TokensLc]] kernel (semantics pinned by test to
 * `filter(split(lower(text), "[^a-z0-9]+"), _ =!= "")`, the same split the
 * DuckDB oracles use); [[qualityFeatures]] computes the token array once
 * per row and derives every token feature from it.
 */
object TextAnalysis {

  /** Token split regex (kernel-equivalent; shared with the oracle SQL). */
  val TokenSplitRegex = "[^a-z0-9]+"

  /** GPT-2-style pre-tokenizer shape: word pieces or single non-space
    * punctuation — the "BPE-ish" token count. */
  val BpeishRegex = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"

  /** Tiny English stopword list (shared with the oracle SQL). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "be", "by", "not")

  /** Lowercased alphanumeric tokens (codegen kernel). */
  def tokens(text: Column): Column = GraftFunctions.tokens_lc(text)

  def tokenCount(text: Column): Column = tokenCountOf(tokens(text))
  def tokenCountOf(toks: Column): Column = size(toks).cast("long")

  /** Whitespace-delimited token count. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= "")).cast("long")

  /** BPE-ish token count via the pre-tokenizer regex. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishRegex), lit(0))).cast("long")

  /** Word k-shingles: ["a","b","c","d"], k=3 → ["a b c","b c d"]. Empty
    * array when fewer than k tokens. (Column-algebra reference shape; the
    * dedup hot path uses the distinct-set kernel
    * [[graft.functions.GraftFunctions.shingle_set]].) */
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
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))
  def stopwordRatioOf(toks: Column): Column = {
    val n = size(toks).cast("double")
    when(n === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(Stopwords.map(lit): _*).cast("boolean"))).cast("double") / n)
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = avgTokenLenOf(tokens(text))
  def avgTokenLenOf(toks: Column): Column = {
    val n = size(toks).cast("double")
    when(n === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") / n)
  }

  /**
   * Heuristic language ID: Unicode-block rules for Kana/CJK/Cyrillic/
   * Greek/Arabic (kana before CJK — Japanese mixes kanji with kana, kanji
   * alone reads Chinese), accented-Latin hints for de/es/fr, else English
   * when the stopword profile matches, else "und". Rule-based
   * (n-gram-profile style, cf. Cavnar & Trenkle 1994) so it is
   * deterministic and SQL-portable.
   */
  def langIdHeuristic(text: Column): Column = langIdOf(text, tokens(text))
  def langIdOf(text: Column, toks: Column): Column = {
    def has(re: String): Column = text.rlike(re)
    when(has("[\\u3040-\\u30ff]"), "ja")
      .when(has("[\\u4e00-\\u9fff]"), "zh")
      .when(has("[\\uac00-\\ud7af]"), "ko")
      .when(has("[\\u0400-\\u04ff]"), "ru")
      .when(has("[\\u0370-\\u03ff]"), "el")
      .when(has("[\\u0600-\\u06ff]"), "ar")
      .when(has("[äöüß]"), "de")
      .when(has("[ñ¿¡]"), "es")
      .when(has("[àâçèêëîïôùûœ]"), "fr")
      .when(stopwordRatioOf(toks) >= 0.02, "en")
      .otherwise("und")
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * some stopwords, sane token lengths. Deterministic scalar math. */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val nTok = tokenCountOf(toks).cast("double")
    val lenOk = when(nTok >= 10 && nTok <= 10000, 1.0).otherwise(0.5)
    val punctOk = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatioOf(toks) >= 0.01, 1.0).otherwise(0.5)
    val tokLen = avgTokenLenOf(toks)
    val tokOk = when(tokLen >= 2.0 && tokLen <= 12.0, 1.0).otherwise(0.0)
    (lenOk * 0.3 + punctOk * 0.3 + stopOk * 0.2 + tokOk * 0.2)
  }

  /**
   * Gopher-style quality rule flags (Rae et al. 2021, table A1, adapted
   * to this engine's mirrored metrics): per-document booleans for each
   * rule plus the composite `keep` — the standard pre-training filter
   * applied BEFORE dedup in a curation pipeline. Emitting per-rule flags
   * (not just the verdict) is deliberate: rule-level pass rates are the
   * first thing a curation run audits.
   *
   * Rules: word count in [minWords, maxWords]; mean word length in
   * [minMeanLen, maxMeanLen]; stopword ratio ≥ minStopRatio; symbol
   * (non-alphanumeric) character ratio ≤ maxPunctRatio; duplicate
   * 3-shingle fraction ≤ maxRepRatio.
   *
   * One narrow tokenize scan — no shuffle; every metric reuses the
   * engine-exact kernels the individual queries already oracle-check.
   */
  def gopherFlags(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id",
                  minWords: Long = 50, maxWords: Long = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minStopRatio: Double = 0.02, maxPunctRatio: Double = 0.1,
                  maxRepRatio: Double = 0.3): DataFrame = {
    val base = df.select(col(idCol), col(textCol).as("__text"),
      tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_words"),
        avgTokenLenOf(col("__tk")).as("__mean_len"),
        stopwordRatioOf(col("__tk")).as("__stop"),
        punctRatio(col("__text")).as("__punct"),
        greatest(size(col("__tk")) - 2, lit(0)).cast("long").as("__n_sh"),
        size(GraftFunctions.shingle_set(col("__tk"), 3)).cast("long")
          .as("__n_distinct"))
    val repRatio = when(col("__n_sh") > 0,
      lit(1.0) - col("__n_distinct").cast("double") /
        col("__n_sh").cast("double")).otherwise(0.0)
    base.select(col(idCol), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("words_ok"),
        (col("__mean_len") >= minMeanLen && col("__mean_len") <= maxMeanLen)
          .as("mean_len_ok"),
        (col("__stop") >= minStopRatio).as("stop_ok"),
        (col("__punct") <= maxPunctRatio).as("symbol_ok"),
        (repRatio <= maxRepRatio).as("rep_ok"))
      .withColumn("keep",
        col("words_ok") && col("mean_len_ok") && col("stop_ok") &&
          col("symbol_ok") && col("rep_ok"))
  }

  /**
   * Fixed-window character chunking with overlap — the standard prep step
   * before tokenization/embedding of long documents. Chunk k covers
   * chars [k·stride, k·stride + chunkSize); the chunk count
   * `1 + ceil(max(len - chunkSize, 0) / stride)` is pure integer
   * arithmetic (engine-exact) and guarantees full coverage with
   * `chunkSize - stride` chars of overlap. A narrow per-row transform:
   * no shuffle, fan-out bounded by doc length / stride.
   */
  def chunkDocs(df: DataFrame, chunkSize: Int = 500, stride: Int = 400,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      "need stride > 0 and chunkSize >= stride (non-negative overlap)")
    df.select(col(idCol), col(textCol).as("__text"))
      .withColumn("n_chunks",
        expr(s"1 + (greatest(length(__text) - $chunkSize, 0) + $stride - 1) DIV $stride"))
      .select(col(idCol), col("n_chunks"),
        posexplode(expr(
          s"transform(sequence(0L, n_chunks - 1), k -> substring(__text, CAST(k * $stride + 1 AS INT), $chunkSize))")))
      .select(col(idCol), col("pos").cast("int").as("chunk_id"),
        col("col").as("chunk"), length(col("col")).cast("long").as("chunk_len"),
        col("n_chunks"))
  }

  /**
   * Repetition ratio: fraction of duplicate word 3-shingles,
   * `1 - distinct/total` — high values flag boilerplate/spam for
   * quality filtering. Both counts come from the codegen'd shingle
   * kernel; the division is the only floating-point op, identical in
   * both engines.
   */
  def repetition(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", shingleWords: Int = 3): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        greatest(size(col("__toks")) - (shingleWords - 1), lit(0))
          .cast("long").as("n_shingles"),
        size(GraftFunctions.shingle_set(col("__toks"), shingleWords))
          .cast("long").as("n_distinct"))
      .select(col(idCol), col("n_shingles"), col("n_distinct"),
        when(col("n_shingles") > 0,
          lit(1.0) - col("n_distinct").cast("double") /
            col("n_shingles").cast("double"))
          .otherwise(0.0).as("rep_ratio"))
  }

  // Scrub patterns kept to constructs with identical semantics in Java
  // regex (Spark) and RE2 (DuckDB): literal classes and bounded
  // quantifiers only — no lookaround, no \w/\b dialect edges.
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlRe = "https?://[^ \\t\\r\\n]+"
  val DigitRunRe = "[0-9]{9,}"

  /**
   * PII/URL scrubbing for training corpora: replace URLs, email
   * addresses, and long digit runs (ids/phones) with typed placeholder
   * tokens, and report per-document match counts (counted on the RAW
   * text, before any replacement). Replacement order is URL → email →
   * digits, so an address inside a URL is scrubbed as part of the URL.
   * Pure narrow projection: no shuffle, codegen regex.
   */
  def scrubPii(df: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        DigitRunRe, "<NUM>").as("scrubbed"),
      regexp_count(t, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(DigitRunRe)).cast("long").as("n_digit_runs"))
  }

  /** One-scan feature projection over a documents table: the token array
    * is computed once per row and shared by every token-derived feature. */
  def qualityFeatures(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol), t.as("__text"), tokens(t).as("__toks"))
      .select(
        col(idCol),
        length(col("__text")).cast("long").as("n_chars_actual"),
        tokenCountOf(col("__toks")).as("n_tokens"),
        wsTokenCount(col("__text")).as("n_ws_tokens"),
        bpeishTokenCount(col("__text")).as("n_bpeish_tokens"),
        punctRatio(col("__text")).as("punct_ratio"),
        stopwordRatioOf(col("__toks")).as("stopword_ratio"),
        avgTokenLenOf(col("__toks")).as("avg_token_len"),
        langIdOf(col("__text"), col("__toks")).as("lang_pred"),
        qualityScoreOf(col("__text"), col("__toks")).as("quality"))
  }
}
