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
 * The view is itself a ManifestTable keyed by the group column with
 * schema `(grp, n LONG, total LONG)`, and its CURSOR — the source
 * version whose feed was last applied — lives in the view's manifest
 * TAG, committed by the SAME atomic rename as the data
 * ([[ManifestTable.upsertAndDelete]] folds the updated groups, the
 * vanished-group deletions, and the tag into one commit). Additive
 * deltas are not idempotent, so cursor-and-data atomicity is the
 * correctness mechanism: a crash anywhere leaves either the old
 * (tag, data) pair — the retry re-derives the identical feed — or the
 * new pair — the retry sees itself caught up. There is no window where
 * a replay could double-apply, including the two cases a separate
 * cursor file cannot handle: a replayed feed that had VANISHED a group
 * (no row left to carry a stamp), and a crash followed by further
 * source commits (the retry's wider feed would overlap the
 * half-recorded window).
 *
 * Sums must be pre-integered by the caller (the engine's determinism
 * rule — `floor(x*100+0.5)` cents); count/sum are the self-maintainable
 * aggregates. Min/max are NOT self-maintainable under deletes, so
 * [[bootstrapExtremes]]/[[syncExtremes]] carry them with the hybrid
 * fold-inserts / recompute-tied-groups strategy instead.
 */
object AggView {

  /** Build the view from the source's CURRENT content; the view's tag
    * records the source version it reflects. `numFiles` defaults to 1:
    * a view is group-cardinality-sized, and a single-file view rides
    * the cheapest commit path on every sync — no touch-set job (the
    * only candidate file is the file) and write-job-fused stats — so
    * the default optimizes the maintenance loop the view exists for;
    * pass a higher count only for genuinely huge group spaces. */
  def bootstrap(spark: SparkSession, srcPath: String, viewPath: String,
                grpCol: String, valCol: String,
                numFiles: Int = 1): Long = {
    val srcV = ManifestTable.readManifest(spark, srcPath).version
    // read the content AT the version the tag will record — resolving
    // "latest" again here would race a concurrent source commit, and a
    // view tagged older than its content double-applies the gap's
    // deltas on the first sync (additive, so NOT self-healing)
    val view = ManifestTable.readAt(spark, srcPath, srcV)
      .groupBy(grpCol)
      .agg(count(lit(1)).as("n"), sum(valCol).as("total"))
    ManifestTable.create(view, viewPath, grpCol, numFiles,
      tag = Some(srcV.toString))
    srcV
  }

  /** Fold-shuffle width sized to the CHANGE WINDOW, not the cluster
    * default: a tiny sync's dominant cost is task launches per shuffle
    * partition (the session width exists for the big scans, not for
    * folding a handful of changed files), so a SMALL window — by its
    * diff read's file count, the sync's natural granularity —
    * pre-clusters on the group key across a few partitions and the
    * aggregation (plus the downstream fold join) reuses that
    * partitioning with no wider exchange. Large windows keep the plain
    * groupBy: its map-side partial aggregation is what bounds shuffle
    * volume when the window really is 100 TB-churn sized. */
  private def sizedFold(spark: SparkSession, union: DataFrame,
                        adds: DataFrame, dels: DataFrame,
                        grpCol: String)
      : org.apache.spark.sql.RelationalGroupedDataset = {
    val files = adds.inputFiles.length + dels.inputFiles.length
    val session = spark.sessionState.conf.numShufflePartitions
    if (files > 0 && files <= 8 && session > files)
      union.repartition(math.max(1, files / 2), col(grpCol))
        .groupBy(grpCol)
    else union.groupBy(grpCol)
  }

  /** One incremental maintenance step: fold the unseen feed (view tag →
    * source latest) into the view, committing data + advanced tag
    * atomically. Returns the (fromV, toV) applied, or None when caught
    * up. */
  def sync(spark: SparkSession, srcPath: String, viewPath: String,
           grpCol: String, valCol: String): Option[(Long, Long)] = {
    // the UNLABELED diff sides: a fold only needs signs (+1 per added
    // row, −1 per removed row — update_pre/post labels carry nothing
    // extra for it), so skipping changesBetween's update-key
    // intersection and label joins saves a diff-wide shuffle per sync
    val (from, latest, adds, dels, _) =
      ManifestTable.consumerWindow(spark, srcPath, viewPath, "view")
        .getOrElse(return None)
    val union = adds.select(col(grpCol), col(valCol), lit(1L).as("__s"))
      .unionByName(dels.select(col(grpCol), col(valCol), lit(-1L).as("__s")))
    val deltas = sizedFold(spark, union, adds, dels, grpCol)
      .agg(sum(col("__s")).as("dn"),
        sum(col("__s") * col(valCol)).as("dtotal"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ManifestTable.materializingWindow("view", from, latest, srcPath) {
      applyDeltas(spark, viewPath, deltas, latest, grpCol)
    } finally deltas.unpersist(blocking = false)
    Some((from, latest))
  }

  /** Sync SEVERAL count/sum views of the SAME source in one pass,
    * materializing each distinct change window ONCE and folding it into
    * every view that sits at that cursor — a dashboard keeping N
    * rollups per source commit otherwise re-reads and re-diffs the
    * window's files N times (the diff read is the sync's data cost; at
    * 100 TB sources it dwarfs the per-view fold). Views at different
    * cursors group by window; each view still commits independently
    * with its own atomic tag (per-view crash semantics identical to
    * [[sync]] — this is a read-sharing optimization, not a cross-view
    * transaction). Returns per view what [[sync]] would. */
  def syncMany(spark: SparkSession, srcPath: String,
               views: Seq[(String, String, String)])
      : Seq[Option[(Long, Long)]] = {
    val latest = ManifestTable.latestVersion(spark, srcPath).getOrElse(
      throw new IllegalStateException(
        s"no committed manifest under $srcPath"))
    val froms = views.map { case (vp, _, _) =>
      ManifestTable.numericTag(spark, vp,
        s"no sync tag on $vp — bootstrap the view first") }
    val results = Array.fill[Option[(Long, Long)]](views.size)(None)
    froms.zipWithIndex.groupBy(_._1).toSeq.sortBy(_._1)
      .foreach { case (from, idxs) =>
        if (from < latest) {
          val (adds, dels, _) =
            try ManifestTable.changeSidesBetween(spark, srcPath, from, latest)
            catch { case e: java.io.FileNotFoundException =>
              throw ManifestTable.lagError("view", from, latest, e) }
          val addsP = adds.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val delsP = dels.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try idxs.foreach { case (_, i) =>
            val (viewPath, grpCol, valCol) = views(i)
            val union = addsP
              .select(col(grpCol), col(valCol), lit(1L).as("__s"))
              .unionByName(delsP
                .select(col(grpCol), col(valCol), lit(-1L).as("__s")))
            val deltas = sizedFold(spark, union, adds, dels, grpCol)
              .agg(sum(col("__s")).as("dn"),
                sum(col("__s") * col(valCol)).as("dtotal"))
            ManifestTable.materializingWindow("view", from, latest, srcPath) {
              applyDeltas(spark, viewPath, deltas, latest, grpCol)
            }
            results(i) = Some((from, latest))
          } finally {
            addsP.unpersist(blocking = false)
            delsP.unpersist(blocking = false)
          }
        }
      }
    results.toSeq
  }

  /** Fold one feed (the [[ManifestTable.changesBetween]] shape) into the
    * view in ONE atomic commit tagged `targetV`: affected groups with a
    * surviving count upsert, groups whose count reaches zero delete,
    * and the tag advances — together or not at all. */
  def applyFeed(spark: SparkSession, viewPath: String, feed: DataFrame,
                targetV: Long, grpCol: String, valCol: String): Unit = {
    // replay guard for DIRECT callers (sync's own retries never reach
    // here — the tag check in sync already short-circuits): additive
    // deltas double-count on re-application, and only delete-heavy
    // replays would trip the below-zero check, so an insert-heavy
    // replay must be caught by the tag instead
    if (ManifestTable.readTag(spark, viewPath).contains(targetV.toString))
      return
    val sign = when(col("_change_type").isin("insert", "update_post"),
      lit(1L)).otherwise(lit(-1L))
    // deltas feed two branches (upserts, deletions) of one commit;
    // persist so the diff computation underneath runs once
    val deltas = feed.groupBy(grpCol)
      .agg(sum(sign).as("dn"), sum(sign * col(valCol)).as("dtotal"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try applyDeltas(spark, viewPath, deltas, targetV, grpCol)
    finally deltas.unpersist(blocking = false)
  }

  /** [[bootstrap]] plus per-group MIN/MAX: view schema
    * `(grp, n, total, mn, mx)`. Maintained by [[syncExtremes]] with the
    * HYBRID strategy real IVM engines use for non-self-maintainable
    * aggregates: inserts fold for free (`least`/`greatest` against the
    * stored extreme), while a delete that TIES a group's stored
    * min/max may have removed its last witness, so exactly those
    * groups recompute their extremes from the source — a scan filtered
    * to the affected groups, pushed to the source read, never a full
    * re-aggregation. `valCol` must be non-null longs (same
    * pre-integered contract as the sums). */
  def bootstrapExtremes(spark: SparkSession, srcPath: String,
                        viewPath: String, grpCol: String, valCol: String,
                        numFiles: Int = 1): Long = {
    val srcV = ManifestTable.readManifest(spark, srcPath).version
    val view = ManifestTable.readAt(spark, srcPath, srcV)
      .groupBy(grpCol)
      .agg(count(lit(1)).as("n"), sum(valCol).as("total"),
        min(valCol).as("mn"), max(valCol).as("mx"))
    ManifestTable.create(view, viewPath, grpCol, numFiles,
      tag = Some(srcV.toString))
    srcV
  }

  /** One incremental step for an extremes view ([[bootstrapExtremes]]):
    * count/sum fold additively; min/max fold for adds and recompute
    * from the source ONLY for groups where a delete tied the stored
    * extreme (conservative: duplicated values may keep the extreme
    * alive, and the recompute resolves that exactly). One atomic
    * commit, tag = source version, same crash-window story as
    * [[sync]]. */
  def syncExtremes(spark: SparkSession, srcPath: String, viewPath: String,
                   grpCol: String, valCol: String): Option[(Long, Long)] = {
    val (from, latest, adds, dels, _) =
      ManifestTable.consumerWindow(spark, srcPath, viewPath, "view")
        .getOrElse(return None)
    val addAgg = adds.groupBy(grpCol).agg(count(lit(1)).as("an"),
      sum(valCol).as("atot"), min(valCol).as("amn"), max(valCol).as("amx"))
    val delAgg = dels.groupBy(grpCol).agg(count(lit(1)).as("xn"),
      sum(valCol).as("xtot"), min(valCol).as("xmn"), max(valCol).as("xmx"))
    val cur = ManifestTable.read(spark, viewPath)
    val folded = addAgg.join(delAgg, Seq(grpCol), "full")
      .join(cur, Seq(grpCol), "left")
      .select(col(grpCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("an"), lit(0L))
          - coalesce(col("xn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("atot"), lit(0L))
          - coalesce(col("xtot"), lit(0L))).as("total"),
        least(col("mn"), col("amn")).as("mn"),   // least/greatest skip nulls
        greatest(col("mx"), col("amx")).as("mx"),
        // a delete TIED to the stored extreme may have removed its last
        // witness; a brand-new group (no stored row) never needs one
        (col("xn").isNotNull && col("n").isNotNull &&
          (col("xmn") <= col("mn") || col("xmx") >= col("mx")))
          .as("__recompute"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ManifestTable.materializingWindow("view", from, latest, srcPath) {
      // one fused probe job (emptiness + negative witness), same
      // rationale as applyDeltas'
      val probe = folded.agg(count(lit(1)).as("n_all"),
        sum(when(col("n") < 0L, 1L).otherwise(0L)).as("n_neg"),
        min(when(col("n") < 0L, col(grpCol).cast("string")))
          .as("neg_grp")).first()
      if (probe.getLong(0) == 0L) {
        ManifestTable.setTagOnly(spark, viewPath, latest.toString)
        Some((from, latest))
      } else {
      if (probe.getLong(1) > 0L) throw new IllegalStateException(
        s"feed drives group '${probe.getString(2)}' below zero rows — the " +
        s"feed window does not match the view's state (tag mismatch?)")
      // exact extremes for the delete-affected groups: one source read
      // at the synced version, SEMI-JOINED down to those groups before
      // aggregating — cost ∝ the affected groups' rows, not the table
      val hot = folded.filter(col("__recompute") && col("n") > 0L)
        .select(col(grpCol))
      val exact = ManifestTable.readAt(spark, srcPath, latest)
        .join(hot, Seq(grpCol), "left_semi")
        .groupBy(grpCol)
        .agg(min(valCol).as("rmn"), max(valCol).as("rmx"))
      val upserts = folded.filter(col("n") > 0L)
        .join(exact, Seq(grpCol), "left")
        .select(col(grpCol), col("n"), col("total"),
          when(col("__recompute"), col("rmn")).otherwise(col("mn")).as("mn"),
          when(col("__recompute"), col("rmx")).otherwise(col("mx")).as("mx"))
      val gone = folded.filter(col("n") === 0L).select(col(grpCol))
      ManifestTable.upsertAndDelete(spark, viewPath, upserts, gone,
        setTag = Some(latest.toString))
      Some((from, latest))
      }
    } finally folded.unpersist(blocking = false)
  }

  /** Commit the per-group (dn, dtotal) deltas: shared tail of the
    * labeled ([[applyFeed]]) and unlabeled ([[sync]]) paths. */
  private def applyDeltas(spark: SparkSession, viewPath: String,
                          deltas: DataFrame, targetV: Long,
                          grpCol: String): Unit = {
    var left = 3
    while (true) {
      val mView = ManifestTable.readManifest(spark, viewPath)
      // a concurrent sync of the SAME view may have applied this window
      // (or a wider one) between our window resolution and here —
      // additive deltas double-count, so the cursor is the guard on
      // every (re-)drive
      if (mView.tag.exists(t => t.nonEmpty && t.forall(_.isDigit) &&
          t.toLong >= targetV)) return
      if (mView.entries.size > 1) {
        applyDeltasGeneral(spark, viewPath, deltas, targetV, grpCol)
        return
      }
      // ≤1-file view: the ENTIRE sync is ONE Spark job — fold, probes,
      // replacement content, file stats all ride the single swap write
      // (per-sync job count dominates small-view maintenance cost; the
      // general path below pays a separate probe job + rewrite)
      try { applyDeltasFused(spark, viewPath, mView, deltas, targetV,
        grpCol); return }
      catch { case e: ManifestTable.ConcurrentCommitException =>
        // newContent derived from a superseded view snapshot — re-read
        // and re-drive (the tag guard above absorbs same-window winners)
        if (left <= 0) throw new IllegalStateException(
          s"commit conflict on $viewPath: retry budget exhausted", e)
        left -= 1
      }
    }
  }

  private def applyDeltasFused(spark: SparkSession, viewPath: String,
                               mView: ManifestTable.Manifest,
                               deltas: DataFrame, targetV: Long,
                               grpCol: String): Unit = {
    val cur = ManifestTable.readFiles(spark, viewPath, mView)
    val applied = deltas.join(cur, Seq(grpCol), "left")
      .select(col(grpCol),
        (coalesce(col("n"), lit(0L)) + col("dn")).as("n"),
        (coalesce(col("total"), lit(0L)) + col("dtotal")).as("total"))
    val probe = org.apache.spark.sql.Observation()
    val probed = applied.observe(probe,
      count(lit(1)).as("n_all"),
      sum(when(col("n") < 0L, 1L).otherwise(0L)).as("n_neg"),
      min(when(col("n") < 0L, col(grpCol).cast("string"))).as("neg_grp"))
    // replacement content: untouched groups carried + surviving folds
    // (the observe node sits UPSTREAM of the n>0 filter, so the gate
    // sees every folded group — including the negatives it must refuse)
    val newView = cur
      .join(deltas.select(col(grpCol)), Seq(grpCol), "left_anti")
      .unionByName(probed.filter(col("n") > 0L))
    ManifestTable.commitSingleFileSwap(spark, viewPath, mView, newView,
      setTag = targetV.toString, op = "view-sync") { () =>
      val p = probe.get
      if (p("n_neg").asInstanceOf[Long] > 0L)
        throw new IllegalStateException(
          s"feed drives group '${p("neg_grp")}' below zero rows — the " +
          "feed window does not match the view's state (tag mismatch?)")
      if (p("n_all").asInstanceOf[Long] == 0L) Some("empty-window")
      else None
    }
  }

  /** The pre-swap general path: any number of view files, one probe job
    * + the standard copy-on-write commit underneath. */
  private def applyDeltasGeneral(spark: SparkSession, viewPath: String,
                                 deltas: DataFrame, targetV: Long,
                                 grpCol: String): Unit = {
      val cur = ManifestTable.read(spark, viewPath)
      val applied = deltas.join(cur, Seq(grpCol), "left")
        .select(col(grpCol),
          (coalesce(col("n"), lit(0L)) + col("dn")).as("n"),
          (coalesce(col("total"), lit(0L)) + col("dtotal")).as("total"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // ONE probe job over the persisted fold: emptiness (a window
        // with no data change — e.g. a source compaction — still
        // advances the tag so the empty diff is not recomputed forever)
        // and a negative-count witness (a feed that does not compose
        // with the view's state — wrong window, foreign feed — must
        // fail loudly, not leave a stale row). The former separate
        // isEmpty + collect pair cost a job each; per-sync job count is
        // the dominant cost of small-view maintenance
        val probe = applied.agg(count(lit(1)).as("n_all"),
          sum(when(col("n") < 0L, 1L).otherwise(0L)).as("n_neg"),
          min(when(col("n") < 0L, col(grpCol).cast("string")))
            .as("neg_grp")).first()
        if (probe.getLong(0) == 0L) {
          ManifestTable.setTagOnly(spark, viewPath, targetV.toString)
          return
        }
        if (probe.getLong(1) > 0L) throw new IllegalStateException(
          s"feed drives group '${probe.getString(2)}' below zero rows — " +
          "the feed window does not match the view's state (tag mismatch?)")
        val upserts = applied.filter(col("n") > 0L)
        val gone = applied.filter(col("n") === 0L).select(col(grpCol))
        ManifestTable.upsertAndDelete(spark, viewPath, upserts, gone,
          setTag = Some(targetV.toString))
        ()
      } finally applied.unpersist(blocking = false)
  }
}
