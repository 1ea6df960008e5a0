package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental materialized-view maintenance over a [[ManifestTable]]'s
 * change data feed: a grouped (count, sum) aggregate kept in sync by
 * applying per-group DELTAS from `changesBetween` — post-images and
 * inserts add, pre-images and deletes subtract — so a sync costs
 * O(change batch + view), never a source rescan. At 100 TB source /
 * group-cardinality view, that is the difference between maintaining a
 * dashboard per commit and re-aggregating the lake.
 *
 * The view is itself a ManifestTable keyed by the group column, with
 * schema `(grp, n LONG, total LONG, src_v LONG)`. `src_v` is the
 * per-group IDEMPOTENCE STAMP — the source version whose feed last
 * touched the group. Deltas are additive, so a replay (crash between
 * apply and cursor advance) would double-apply; the stamp prevents it:
 * groups already at the feed's target version are skipped. The apply
 * order makes every crash window converge:
 *
 *   1. merge ALL affected groups (including ones whose post-count is 0)
 *      with the new stamp — a crash after this point replays to
 *      all-groups-skipped;
 *   2. delete groups whose count reached 0 (group vanished from the
 *      source) — reads the view, so a replay that skipped step 1 still
 *      finds and removes them;
 *   3. advance the cursor.
 *
 * Sums must be pre-integered by the caller (the engine's determinism
 * rule — `floor(x*100+0.5)` cents); count/sum are the self-maintainable
 * aggregates (min/max are not incrementally maintainable under deletes
 * without keeping per-group heaps — use a rollup recompute for those,
 * `StreamingJobs.streamingDailyRollup`).
 */
object AggView {

  /** Build the view from the source's CURRENT content and stamp every
    * group with the source version it reflects; the cursor starts
    * there. */
  def bootstrap(spark: SparkSession, srcPath: String, viewPath: String,
                cursorPath: String, grpCol: String, valCol: String,
                numFiles: Int = 4): Long = {
    val srcV = ManifestTable.readManifest(spark, srcPath).version
    val view = ManifestTable.read(spark, srcPath)
      .groupBy(grpCol)
      .agg(count(lit(1)).as("n"), sum(valCol).as("total"))
      .withColumn("src_v", lit(srcV))
    ManifestTable.create(view, viewPath, grpCol, numFiles)
    ManifestTable.writeCursor(spark, cursorPath, srcV)
    srcV
  }

  /** One incremental maintenance step: fold the unseen feed into the
    * view and advance the cursor. Returns the (fromV, toV) applied, or
    * None when caught up. */
  def sync(spark: SparkSession, srcPath: String, viewPath: String,
           cursorPath: String, grpCol: String, valCol: String)
      : Option[(Long, Long)] = {
    val latest = ManifestTable.latestVersion(spark, srcPath).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $srcPath"))
    val from = ManifestTable.readCursor(spark, cursorPath).getOrElse(
      throw new IllegalStateException(
        s"no cursor at $cursorPath — bootstrap the view first"))
    if (from >= latest) return None
    val feed =
      try ManifestTable.changesBetween(spark, srcPath, from, latest)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"view cursor v$from lagged past the source's retention " +
            s"window (latest v$latest) — re-bootstrap the view")
      }
    applyFeed(spark, viewPath, feed, latest, grpCol, valCol)
    ManifestTable.writeCursor(spark, cursorPath, latest)
    Some((from, latest))
  }

  /** Fold one feed (the [[ManifestTable.changesBetween]] shape) into the
    * view, stamping affected groups with `targetV`. Idempotent per
    * stamp: groups already at `targetV` are skipped on replay. */
  def applyFeed(spark: SparkSession, viewPath: String, feed: DataFrame,
                targetV: Long, grpCol: String, valCol: String): Unit = {
    val sign = when(col("_change_type").isin("insert", "update_post"),
      lit(1L)).otherwise(lit(-1L))
    val deltas = feed.groupBy(grpCol)
      .agg(sum(sign).as("dn"), sum(sign * col(valCol)).as("dtotal"))
    val cur = ManifestTable.read(spark, viewPath)
    val applied = deltas.join(cur, Seq(grpCol), "left")
      .filter(col("src_v").isNull || col("src_v") =!= lit(targetV))
      .select(col(grpCol),
        (coalesce(col("n"), lit(0L)) + col("dn")).as("n"),
        (coalesce(col("total"), lit(0L)) + col("dtotal")).as("total"),
        lit(targetV).as("src_v"))
    if (!applied.isEmpty) {
      ManifestTable.merge(spark, viewPath, applied)
      ()
    }
    // vanished groups: count reached 0 — read back so a replay that
    // skipped the merge still removes them
    val gone = ManifestTable.read(spark, viewPath)
      .filter(col("n") === 0L).select(col(grpCol))
    if (!gone.isEmpty) {
      ManifestTable.deleteKeys(spark, viewPath, gone)
      ()
    }
  }
}
