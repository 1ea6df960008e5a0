package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * CSV schema-apply (operator P1 in SURVEY.md §2.3) and its inverse.
 *
 * The reference parses positionally with `line.split(",")` + throwing casts
 * (reference: flinkStreamProcessing.scala:107-115,
 * flinkStreamingJDBCSink.scala:117-121). Spark-first equivalent: `from_csv`
 * with an explicit schema — codegen'd, no per-record closure. Two modes:
 *  - strict ("FAILFAST"): a malformed row fails the job, like the reference;
 *  - permissive: malformed rows yield nulls, the right default at 100 TB
 *    (one bad row must not kill a 1000-executor stage).
 */
object Csv {

  val dailyPriceSchema: StructType = Encoders.product[graft.model.DailyPrice].schema
  val sensorSchema: StructType = Encoders.product[graft.model.SensorReading].schema

  /** Parse a single string column `value` into typed columns (P1). */
  def parse(df: DataFrame, schema: StructType, strict: Boolean = true,
            valueCol: String = "value"): DataFrame = {
    val mode = if (strict) "FAILFAST" else "PERMISSIVE"
    df.select(from_csv(col(valueCol), schema,
        Map("mode" -> mode, "ignoreLeadingWhiteSpace" -> "true",
            "ignoreTrailingWhiteSpace" -> "true")).as("r"))
      .select(col("r.*"))
  }

  /** Inverse of parse: all columns → one CSV line (used by the Kafka-shaped
    * sinks and the enrichment projection P6). */
  def format(cols: Seq[Column]): Column = concat_ws(",", cols: _*)

  /**
   * Quarantine parse for 100 TB ingestion: parses permissively, splitting
   * the stream into (valid rows, raw malformed lines). One bad row must
   * neither kill a 1000-executor stage (strict mode) nor silently vanish
   * (plain permissive) — quarantined lines go to a dead-letter sink for
   * replay after a parser fix.
   */
  def parseQuarantine(df: DataFrame, schema: StructType,
                      valueCol: String = "value"): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+ StructField("_corrupt", StringType))
    val parsed = df.select(col(valueCol), from_csv(col(valueCol), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt",
            "ignoreLeadingWhiteSpace" -> "true",
            "ignoreTrailingWhiteSpace" -> "true")).as("r"))
    val valid = parsed.filter(col("r._corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
    val quarantined = parsed.filter(col("r._corrupt").isNotNull)
      .select(col(valueCol).as("raw_line"))
    (valid, quarantined)
  }
}
