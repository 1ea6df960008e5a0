package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
}
