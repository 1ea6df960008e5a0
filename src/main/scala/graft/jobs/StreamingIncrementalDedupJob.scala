package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingJobs

/**
 * The weekly-crawl dedup loop as a RUNNABLE streaming job — the
 * continuous form of [[IncrementalDedupJob]]: watch a directory for new
 * crawl parquet drops, probe each micro-batch against the persisted
 * dedup index, record the flagged duplicate pairs, and append the
 * survivors so later drops dedup against earlier ones.
 *
 * Delivery semantics, end to end:
 *  - index appends are EXACTLY-ONCE
 *    ([[graft.ext.Dedup.appendToDedupIndexEpoch]] — epoch marker commit;
 *    a crash-replayed batch is detected and skipped wholesale);
 *  - the dup-pairs record is idempotent: each epoch overwrites its OWN
 *    `dup_pairs/epoch_<N>` directory, so an at-least-once replay of an
 *    uncommitted epoch converges instead of duplicating rows.
 *
 * The index must exist ([[graft.ext.Dedup.buildDedupIndex]] — run the
 * batch job once to bootstrap); `autoCompactMaxFiles > 0` lets the
 * stream run its own LSM maintenance.
 */
object StreamingIncrementalDedupJob {

  /** args: watchDir indexDir outDir checkpointDir [threshold]
    * [autoCompactMaxFiles] [maxFilesPerTrigger] */
  def main(args: Array[String]): Unit = {
    val Array(watchDir, indexDir, outDir, checkpointDir) = args.take(4)
    val threshold = args.lift(4).map(_.toDouble).getOrElse(0.8)
    val autoCompactMaxFiles = args.lift(5).map(_.toInt).getOrElse(0)
    val maxFilesPerTrigger = args.lift(6).map(_.toInt).getOrElse(0)
    val spark = graft.GraftSession.create("graft-streaming-dedup")
    val q = start(spark, watchDir, indexDir, outDir, checkpointDir,
      threshold, autoCompactMaxFiles, maxFilesPerTrigger)
    q.awaitTermination()
  }

  /** `maxFilesPerTrigger > 0` bounds each micro-batch to that many crawl
    * files — a restart against a week of backlog then drains as several
    * bounded epochs instead of one giant batch whose probe/append must
    * fit executor memory at once (each epoch commits its own marker, so
    * a crash mid-drain loses at most one bounded batch). 0 = engine
    * default (all available). */
  def start(spark: SparkSession, watchDir: String, indexDir: String,
            outDir: String, checkpointDir: String,
            threshold: Double = 0.8,
            autoCompactMaxFiles: Int = 0,
            maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val reader = spark.readStream
      .schema("doc_id LONG, text STRING")
    val docs = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(watchDir)
    StreamingJobs.streamingIncrementalDedup(docs, indexDir, threshold,
      onDupPairs = (pairs, epoch) =>
        pairs.write.mode("overwrite")
          .parquet(s"$outDir/dup_pairs/epoch_$epoch"),
      queryId = "weeklycrawl",
      autoCompactMaxFiles = autoCompactMaxFiles)
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
