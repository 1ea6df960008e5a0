package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.ManifestTable
import graft.streaming.StreamingJobs

/**
 * CDC ingestion into a mutable table as a RUNNABLE streaming job: watch a
 * directory for parquet drops of upsert batches (or change feeds with
 * `cdf = true`) and merge each micro-batch copy-on-write into a
 * [[ManifestTable]] — the continuous counterpart of [[TableMirrorJob]]
 * for when changes ARRIVE as a stream rather than being pulled from
 * another table's manifest history.
 *
 * The first drop bootstraps the table; replayed micro-batches converge
 * (merge is content-idempotent — see
 * [[StreamingJobs.streamingTableUpsert]]). Schema comes from the existing
 * table's manifest, or from `schemaDdl` when bootstrapping a fresh path.
 */
object StreamingUpsertJob {

  /** args: watchDir tablePath keyCol checkpointDir [schemaDdl]
    * [numFiles] [maxFilesPerTrigger] [cdf] [dv] — schemaDdl may be the
    * empty string when the table already exists; dv=true lands each
    * micro-batch through the deletion-vector commit (sidecar + append,
    * zero data files rewritten — pair with a compaction cadence). */
  def main(args: Array[String]): Unit = {
    val Array(watchDir, tablePath, keyCol, checkpointDir) = args.take(4)
    val schemaDdl = args.lift(4).filter(_.nonEmpty)
    val numFiles = args.lift(5).map(_.toInt).getOrElse(8)
    val maxFilesPerTrigger = args.lift(6).map(_.toInt).getOrElse(1)
    val cdf = args.lift(7).exists(_.toBoolean)
    val dv = args.lift(8).exists(_.toBoolean)
    val spark = graft.GraftSession.create("graft-streaming-upsert")
    val q = start(spark, watchDir, tablePath, keyCol, checkpointDir,
      schemaDdl, numFiles, maxFilesPerTrigger, cdf, dv)
    q.awaitTermination()
  }

  /** `maxFilesPerTrigger` defaults to 1 — each dropped file is its own
    * micro-batch. This is a CORRECTNESS bound, not a tuning knob: a
    * batch that concatenates several drops would break upsert semantics
    * (two drops updating the same key violate merge's key-unique
    * contract; a cdf insert-then-delete pair across drops would apply
    * deletes before inserts and resurrect the key). Raise it (or pass 0
    * for unbounded) ONLY when drops are known key-disjoint. */
  def start(spark: SparkSession, watchDir: String, tablePath: String,
            keyCol: String, checkpointDir: String,
            schemaDdl: Option[String] = None, numFiles: Int = 8,
            maxFilesPerTrigger: Int = 1,
            cdf: Boolean = false, dv: Boolean = false): StreamingQuery = {
    val ddl = schemaDdl.getOrElse {
      val base = ManifestTable.readManifest(spark, tablePath).schema.toDDL
      if (cdf) s"_change_type STRING, $base" else base
    }
    val reader = spark.readStream.schema(ddl)
    val batches = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(watchDir)
    StreamingJobs.streamingTableUpsert(batches, tablePath, keyCol,
      numFiles, cdf, dv)
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
