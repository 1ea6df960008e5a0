package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingJobs

/**
 * Continuous embedding-store ingest as a RUNNABLE streaming job — the
 * ANN twin of [[StreamingIncrementalDedupJob]]: watch a directory for
 * new embedding parquet drops, probe each micro-batch against the
 * persisted IVF index, record near-dup hits (top-1 indexed cosine ≥
 * threshold), and append only the NOVEL vectors so the index grows
 * deduplicated, crawl after crawl.
 *
 * Delivery semantics, end to end:
 *  - index appends are EXACTLY-ONCE
 *    ([[graft.ext.Similarity.appendToIvfIndexEpoch]] — epoch marker
 *    commit; a crash-replayed batch is detected and skipped wholesale);
 *  - the hits record is idempotent: each epoch overwrites its OWN
 *    `dup_hits/epoch_<N>` directory, so an at-least-once replay of an
 *    uncommitted epoch converges instead of duplicating rows.
 *
 * The index must exist ([[graft.ext.Similarity.buildIvfIndex]] — run a
 * batch bootstrap once); `autoCompactMaxFiles > 0` lets the stream run
 * its own LSM maintenance. Quantizer drift: appends assign against the
 * STORED centroids, so after major distribution shift schedule a batch
 * rebuild — the stream only ever needs its checkpoint dir and the
 * index path.
 */
object StreamingEmbedIndexJob {

  /** args: watchDir indexDir outDir checkpointDir [threshold]
    * [autoCompactMaxFiles] [maxFilesPerTrigger] */
  def main(args: Array[String]): Unit = {
    val Array(watchDir, indexDir, outDir, checkpointDir) = args.take(4)
    val threshold = args.lift(4).map(_.toDouble).getOrElse(0.95)
    val autoCompactMaxFiles = args.lift(5).map(_.toInt).getOrElse(0)
    val maxFilesPerTrigger = args.lift(6).map(_.toInt).getOrElse(0)
    val spark = graft.GraftSession.create("graft-streaming-embed-index")
    val q = start(spark, watchDir, indexDir, outDir, checkpointDir,
      threshold, autoCompactMaxFiles, maxFilesPerTrigger)
    q.awaitTermination()
  }

  /** `maxFilesPerTrigger > 0` bounds each micro-batch (backlog drains as
    * several bounded epochs, each with its own exactly-once marker —
    * see [[StreamingIncrementalDedupJob.start]]); 0 = all available. */
  def start(spark: SparkSession, watchDir: String, indexDir: String,
            outDir: String, checkpointDir: String,
            threshold: Double = 0.95,
            autoCompactMaxFiles: Int = 0,
            maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val reader = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
    val vecs = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(watchDir)
    StreamingJobs.streamingEmbedIndexAppend(vecs, indexDir, threshold,
      onDupHits = (hits, epoch) =>
        hits.write.mode("overwrite")
          .parquet(s"$outDir/dup_hits/epoch_$epoch"),
      queryId = "embcrawl",
      autoCompactMaxFiles = autoCompactMaxFiles)
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
