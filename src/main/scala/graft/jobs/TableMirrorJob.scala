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
 * First run (no cursor yet) BOOTSTRAPS: full copy of the source at its
 * latest version, then the cursor records that version. Every later run
 * applies `changesBetween(cursor, latest)` — computed from only the
 * files the two source manifests disagree on — through
 * [[ManifestTable.applyChanges]] (upsert `insert`/`update_post`, delete
 * `delete`; replays converge, so a crash between apply and cursor
 * advance self-heals on the next run). A source COMPACTION moves every
 * row to new files but changes none, so the sync after it applies an
 * empty feed — the mirror does not re-copy a compacted table.
 *
 * The source retains ONE superseded version (snapshot-expiry contract),
 * so the mirror must sync at least once per source commit cycle; lagging
 * past the window fails loudly with a re-bootstrap instruction rather
 * than silently skipping changes.
 */
object TableMirrorJob {

  /** args: srcTable dstTable cursorFile [numFiles for bootstrap] */
  def main(args: Array[String]): Unit = {
    val Array(src, dst, cursor) = args.take(3)
    val numFiles = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.create("graft-table-mirror")
    try run(spark, src, dst, cursor, numFiles)
    finally spark.stop()
  }

  /** Returns the (fromV, toV) applied; (0, v) for a bootstrap; None when
    * already caught up. */
  def run(spark: SparkSession, src: String, dst: String, cursor: String,
          numFiles: Int = 8): Option[(Long, Long)] =
    ManifestTable.readCursor(spark, cursor) match {
      case None =>
        val m = ManifestTable.readManifest(spark, src)
        ManifestTable.create(ManifestTable.read(spark, src), dst,
          m.keyCol, numFiles)
        ManifestTable.writeCursor(spark, cursor, m.version)
        Some((0L, m.version))
      case Some(_) =>
        ManifestTable.syncMirror(spark, src, dst, cursor)
    }
}
