package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.io.ManifestTable

/**
 * Incremental replication between two manifest tables as ONE runnable
 * job — the consumer side of the table's change data feed: keep a
 * downstream copy (a serving replica, a silver projection, a
 * cross-region mirror) in sync at cost ∝ what changed, never a full
 * re-copy.
 *
 * First run (destination does not exist) BOOTSTRAPS: full copy of the
 * source at its latest version, with that version recorded as the
 * destination's manifest TAG. Every later run applies
 * `changesBetween(tag, latest)` — computed from only the files the two
 * source manifests disagree on — in ONE atomic destination commit that
 * also advances the tag ([[ManifestTable.syncMirror]]); data and
 * cursor can never disagree, so every crash window retries cleanly. A
 * source COMPACTION moves every row to new files but changes none, so
 * the sync after it advances the tag without rewriting any data file.
 *
 * A destination that EXISTS but carries no sync tag is refused loudly
 * (it was not created by this job — silently re-bootstrapping would
 * overwrite a table this job does not own). The source retains ONE
 * superseded version (snapshot-expiry contract), so the mirror must
 * sync at least once per source commit cycle; lagging past the window
 * fails loudly with a re-bootstrap instruction rather than silently
 * skipping changes.
 */
object TableMirrorJob {

  /** args: srcTable dstTable [numFiles for bootstrap] */
  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val numFiles = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.create("graft-table-mirror")
    try run(spark, src, dst, numFiles)
    finally spark.stop()
  }

  /** Returns the (fromV, toV) applied; (0, v) for a bootstrap; None when
    * already caught up. */
  def run(spark: SparkSession, src: String, dst: String,
          numFiles: Int = 8): Option[(Long, Long)] =
    ManifestTable.dispatchConsumer(spark, dst) {
      val m = ManifestTable.readManifest(spark, src)
      // content pinned to the tagged version — resolving "latest" again
      // would race a concurrent source commit
      ManifestTable.create(ManifestTable.readAt(spark, src, m.version),
        dst, m.keyCol, numFiles, tag = Some(m.version.toString))
      m.version
    } {
      ManifestTable.syncMirror(spark, src, dst)
    }
}
