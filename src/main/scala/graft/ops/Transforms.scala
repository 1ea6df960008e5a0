package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Projections / filters / scalar transforms P2-P9 (SURVEY.md §2.3), as pure
 * DataFrame→DataFrame builders usable by both batch and streaming plans.
 * All are Column algebra — whole-stage-codegen'd, no Scala closures.
 */
object Transforms {

  /** P3: symbol-set filter (reference: flinkStreamProcessing.scala:129). */
  def symbolSetFilter(df: DataFrame, symbols: Seq[String], symbolCol: String = "symbol"): DataFrame =
    df.filter(col(symbolCol).isin(symbols: _*))

  /** P4: parameterized threshold filter
    * (reference: flinkStreamingInput.scala:123-126). */
  def thresholdFilter(df: DataFrame, symb: String, high: Double, low: Double): DataFrame =
    df.filter(col("symbol") === symb && (col("high") >= high || col("low") <= low))

  /**
   * P5: compound date-range filter, reproduced with the reference's
   * *unparenthesized* precedence — `&&` binds tighter than `||`
   * (reference: flinkStreamProcessing.scala:148-151). Do not "fix".
   * Shape: (symbol∈S && high==h) || (low==l && yr>=from && yr<=to)
   */
  def compoundFilter(df: DataFrame, symbols: Seq[String], high: Double, low: Double,
                     yearFrom: Int, yearTo: Int): DataFrame = {
    val yr = Dates.extractYear(col("trdate"))
    df.filter(
      col("symbol").isin(symbols: _*) && col("high") === high ||
      col("low") === low && yr >= yearFrom && yr <= yearTo)
  }

  /**
   * P6: enrichment projection — prepend processing-time stamp + source topic,
   * append intraday change, emit one CSV string
   * (reference: flinkStreamProcessing.scala:130-134). `clockEpochSec` is
   * injectable for deterministic tests (SURVEY.md §5 item 6); pass None for
   * wall-clock `unix_timestamp()`.
   */
  def enrich(df: DataFrame, topic: String, clockEpochSec: Option[Long] = None): DataFrame = {
    val ts: Column = clockEpochSec.map(lit(_)).getOrElse(unix_timestamp())
    df.select(
      ts.as("ingest_ts"),
      lit(topic).as("src_topic"),
      col("*"),
      (col("close") - col("open")).as("intraday_chg"))
  }

  /** P6 string-shape variant: the reference emits a single CSV line. */
  def enrichCsvLine(df: DataFrame, topic: String, clockEpochSec: Option[Long] = None): DataFrame = {
    val e = enrich(df, topic, clockEpochSec)
    e.select(Csv.format(e.columns.map(col).toSeq).as("value"))
  }

  /**
   * P7: tokenize — lowercase, split on non-word, drop empties
   * (reference: flinkStarter.scala:14-18), via the one-pass codegen kernel
   * (semantics = `split(lower(text), "\\W+")` minus empties, pinned by
   * test). `explode` keeps this fully distributed; no driver-side
   * collection.
   */
  def tokenize(df: DataFrame, textCol: String = "value"): DataFrame =
    df.select(explode(
      graft.functions.GraftFunctions.tokens_word(col(textCol))).as("word"))

  /** A1 batch shape: word count. Streaming shape lives in
    * graft.streaming.WordCountJob (update mode + processing-time trigger;
    * SURVEY.md §7.4 item 2). */
  def wordCount(df: DataFrame, textCol: String = "value"): DataFrame =
    tokenize(df, textCol).groupBy("word").agg(count(lit(1)).as("cnt"))

  /**
   * Overflow-safe multiplicative 32-bit limb hash of a NON-NEGATIVE id —
   * the Column form of the `limbHash` used by the samplers and the split
   * assigner (21-bit limbs × 32-bit odd constants; every intermediate
   * ≤ 2^54, so nothing wraps and the DuckDB mirror is plain integer
   * arithmetic). For id ≥ 0 the bit ops below are exactly
   * `pmod(id, 2^21)` / `id DIV 2^21` in the SQL-string variant.
   */
  def limbHash32(id: Column): Column =
    pmod(
      id.bitwiseAND(lit(2097151L)) * lit(2654435761L)
        + shiftright(id, 21).bitwiseAND(lit(2097151L)) * lit(2246822519L)
        + shiftright(id, 42) * lit(3266489917L),
      lit(4294967296L))
}
