package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * CONTINUOUS change-feed consumption — the mirror and the agg view as
 * long-running streaming jobs instead of scheduler-driven `run()` loops:
 * a Structured Streaming query whose micro-batch cadence drives one
 * consumer poll per trigger, so a merge landing on the source table is
 * picked up and applied downstream within `intervalMs`, with no external
 * driver re-launching anything.
 *
 * WHY the streaming engine provides only the LIFECYCLE here (trigger
 * cadence, graceful stop, restart, failure surfacing) and deliberately
 * NOT the cursor: the consumer's exactly-once position is the
 * destination manifest's TAG, committed by the same atomic rename as the
 * data ([[graft.io.ManifestTable.syncMirror]] /
 * [[graft.io.AggView.sync]]). A streaming checkpoint tracking source
 * versions as offsets would re-introduce the two-cursor problem the tag
 * design exists to kill — a crash between the data commit and the
 * offset commit would replay or skip a window. With the tag as the only
 * cursor, this job needs NO checkpoint at all: kill it anywhere,
 * restart it cold, and the next poll resumes from the tag — either the
 * previous sync committed (tag advanced, poll starts after it) or it
 * did not (tag unchanged, poll re-derives the identical feed). The
 * driving rate stream's own offsets are meaningless ticks.
 *
 * The first poll BOOTSTRAPS a missing destination (full copy of the
 * source at its tagged version) through the same
 * [[graft.io.ManifestTable.dispatchConsumer]] refusal semantics as the
 * one-shot jobs: an existing untagged destination is never overwritten.
 * A poll that finds the consumer lagged past the source's retention
 * window fails the QUERY loudly (re-bootstrap or widen retention) —
 * silently skipping a window would diverge the mirror forever.
 */
object StreamingChangeFeedJob {

  /** args: mode(mirror|aggview) srcTable dstTable [grpCol valCol]
    * [intervalMs] [numFiles] */
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val Array(src, dst) = args.slice(1, 3)
    val spark = graft.GraftSession.create("graft-streaming-cdf")
    val q = mode match {
      case "mirror" =>
        startMirror(spark, src, dst,
          intervalMs = args.lift(3).map(_.toLong).getOrElse(1000L),
          numFiles = args.lift(4).map(_.toInt).getOrElse(8))
      case "aggview" | "aggview-extremes" =>
        val Array(grpCol, valCol) = args.slice(3, 5)
        startAggView(spark, src, dst, grpCol, valCol,
          intervalMs = args.lift(5).map(_.toLong).getOrElse(1000L),
          numFiles = args.lift(6).map(_.toInt).getOrElse(4),
          extremes = mode == "aggview-extremes")
      case other => throw new IllegalArgumentException(
        s"mode '$other' — expected mirror|aggview|aggview-extremes")
    }
    q.awaitTermination()
  }

  /** Continuously replicate `src` into `dst` (bootstrap on first poll,
    * then one `syncMirror` per trigger). */
  def startMirror(spark: SparkSession, src: String, dst: String,
                  intervalMs: Long = 1000L,
                  numFiles: Int = 8): StreamingQuery =
    pollingStream(spark, intervalMs) { () =>
      TableMirrorJob.run(spark, src, dst, numFiles); ()
    }

  /** Continuously maintain the grouped (count, sum) rollup — or, with
    * `extremes`, the (count, sum, min, max) rollup — of `src` at
    * `viewPath` (bootstrap on first poll, then one incremental fold per
    * trigger). */
  def startAggView(spark: SparkSession, src: String, viewPath: String,
                   grpCol: String, valCol: String,
                   intervalMs: Long = 1000L,
                   numFiles: Int = 4,
                   extremes: Boolean = false): StreamingQuery =
    pollingStream(spark, intervalMs) { () =>
      if (extremes)
        AggViewJob.runExtremes(spark, src, viewPath, grpCol, valCol,
          numFiles)
      else AggViewJob.run(spark, src, viewPath, grpCol, valCol, numFiles)
      ()
    }

  /** The lifecycle shell: a 1-row/s rate stream whose micro-batches are
    * pure ticks — each trigger runs `poll` once on the driver. The rate
    * rows themselves are discarded; an exception from `poll` fails the
    * query (surfaced by awaitTermination), which is the loud behavior
    * the lag/foreign-destination refusals need. */
  private def pollingStream(spark: SparkSession, intervalMs: Long)
                           (poll: () => Unit): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: DataFrame, _: Long) => poll() }
      .start()
}
