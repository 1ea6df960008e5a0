package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingJobs

/**
 * Continuously-maintained daily rollup as a RUNNABLE streaming job
 * (bronze→silver materialization): watch a directory for event parquet
 * drops (normalized shape: `event_id LONG, user_id LONG, ts LONG`
 * nanosecond-epoch, `event_type STRING, value DOUBLE`), land each
 * micro-batch in `store/raw` exactly-once, and recompute the
 * `store/rollup/event_day=<N>/` partitions the batch touched
 * (idempotent recompute-from-raw + dynamic partition overwrite — see
 * [[StreamingJobs.streamingDailyRollup]] for the delivery-semantics
 * walk-through). Queries serve from `store/rollup` with directory-level
 * day pruning; a crash at ANY point converges on restart.
 */
object StreamingRollupJob {

  /** args: watchDir storeDir checkpointDir [maxFilesPerTrigger] */
  def main(args: Array[String]): Unit = {
    val Array(watchDir, storeDir, checkpointDir) = args.take(3)
    val maxFilesPerTrigger = args.lift(3).map(_.toInt).getOrElse(0)
    val spark = graft.GraftSession.create("graft-streaming-rollup")
    val q = start(spark, watchDir, storeDir, checkpointDir,
      maxFilesPerTrigger)
    q.awaitTermination()
  }

  def start(spark: SparkSession, watchDir: String, storeDir: String,
            checkpointDir: String,
            maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val reader = spark.readStream.schema(
      "event_id LONG, user_id LONG, ts LONG, event_type STRING, " +
      "value DOUBLE")
    val events = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(watchDir)
    StreamingJobs.streamingDailyRollup(events, storeDir)
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
