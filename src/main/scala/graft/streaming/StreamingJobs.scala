package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.model.{DailyPrice, SensorReading}
import graft.ops.{Csv, Transforms}

/**
 * Streaming pipelines (SURVEY.md §2.7). Every transform here is a pure
 * DataFrame→DataFrame function, so the identical logical pipeline runs
 * bounded (spark.read) and unbounded (spark.readStream) — the Spark
 * mirror of the reference running one DataStream program in STREAMING or
 * BATCH runtime mode (T5).
 */
object StreamingJobs {

  /**
   * A1 (reference flinkStarter.scala:22-24): word count over a line
   * stream. The reference uses a 5 s processing-time tumbling window;
   * Spark has no processing-time window column, so the parity shape is
   * update-mode running counts emitted on a 5 s processing-time trigger —
   * per-trigger deltas ≈ per-window counts (§7.4 item 2; golden tests
   * assert per-key totals, which agree under both semantics).
   */
  def wordCount(lines: DataFrame): DataFrame = Transforms.wordCount(lines)

  /** A1 exact-window alternative: stamp ingest time as event time and use
    * a real 5 s tumbling window (alignment then matches wall clock). */
  def windowedWordCount(lines: DataFrame, window: String = "5 seconds"): DataFrame =
    Transforms.tokenize(lines)
      .withColumn("ingest_ts", current_timestamp())
      .groupBy(org.apache.spark.sql.functions.window(col("ingest_ts"), window), col("word"))
      .agg(count(lit(1)).as("cnt"))

  /**
   * A3 (reference flinkTableManipulation.scala:115): streaming grouped
   * min/max by (symbol, year) over CSV price lines — the changelog query.
   * Run with outputMode update (per-trigger revisions, like
   * toChangelogStream) or complete (console demos).
   */
  def minMaxBySymbolYear(csvLines: DataFrame): DataFrame =
    Csv.parse(csvLines, Csv.dailyPriceSchema)
      .groupBy(col("symbol"), year(to_date(col("trdate"), "yyyy-MM-dd")).as("yearr"))
      .agg(min("high").as("MIN_HIGH"), max("high").as("MAX_HIGH"))

  /**
   * Event-time tumbling window with watermark (extension over the
   * reference, which never uses event time — T2/T3): late data beyond
   * `lateness` is dropped and state is GC'd, which is what makes
   * unbounded streams safe at 100 TB/day scale.
   */
  def hourlyEventCounts(events: DataFrame, tsCol: String = "ts",
                        lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total_value"))

  /**
   * T7 stateful processing beyond windowed aggs: per-sensor running state
   * via mapGroupsWithState — the Spark shape for the reference's
   * accumulate-on-update JDBC semantics (sensor_temp += delta,
   * iteration += 1) kept inside the engine instead of the database.
   * Processing-time timeout bounds state lifetime.
   */
  final case class SensorState(sensorId: String, lastTs: Long,
                               tempSum: Double, iterations: Long)

  def sensorRunningState(readings: Dataset[SensorReading],
                         timeout: Option[String] = None): Dataset[SensorState] = {
    import readings.sparkSession.implicits._
    // Processing-time timeout bounds per-key state lifetime at scale; it
    // is opt-in because timeout checks make the engine schedule batches
    // continuously (so test harnesses using processAllAvailable never
    // quiesce). Production: pass Some("1 hour") (or move to an event-time
    // watermark timeout when readings carry event time).
    val mode = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    readings
      .groupByKey(_.sensorId)
      .mapGroupsWithState[SensorState, SensorState](mode) {
        case (id, rows, state: GroupState[SensorState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s
          } else {
            val prev = state.getOption.getOrElse(SensorState(id, 0L, 0.0, 0L))
            val next = rows.foldLeft(prev) { (acc, r) =>
              SensorState(id, math.max(acc.lastTs, r.sensorTStamp),
                acc.tempSum + r.sensorTemp, acc.iterations + 1)
            }
            state.update(next)
            timeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** Start helper: memory sink for tests, console for demos. */
  def startMemory(df: DataFrame, queryName: String, mode: OutputMode,
                  trigger: Trigger = Trigger.ProcessingTime(0L)) =
    df.writeStream.format("memory").queryName(queryName)
      .outputMode(mode).trigger(trigger).start()
}
