package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.io.{AggView, ManifestTable}

/**
 * Incremental materialized-view maintenance as ONE runnable job — the
 * scheduled form of [[graft.io.AggView]]: keep a grouped (count, sum)
 * rollup of a manifest table current by folding its change feed, at
 * cost ∝ the change batch + the view, never a source re-aggregation.
 *
 * First run (view does not exist) BOOTSTRAPS from the source's current
 * content; every later run syncs the unseen window. The view's cursor
 * is its manifest tag, committed atomically with the data, so a killed
 * run retries cleanly (see AggView's scaladoc for the crash-window
 * analysis). An existing view without a sync tag is refused rather
 * than silently rebuilt.
 */
object AggViewJob {

  /** args: srcTable viewPath grpCol valCol [numFiles for bootstrap] */
  def main(args: Array[String]): Unit = {
    val Array(src, view, grpCol, valCol) = args.take(4)
    val numFiles = args.lift(4).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.create("graft-agg-view")
    try run(spark, src, view, grpCol, valCol, numFiles)
    finally spark.stop()
  }

  /** Returns the (fromV, toV) applied; (0, v) for a bootstrap; None when
    * already caught up. */
  def run(spark: SparkSession, src: String, view: String, grpCol: String,
          valCol: String, numFiles: Int = 4): Option[(Long, Long)] =
    ManifestTable.dispatchConsumer(spark, view) {
      AggView.bootstrap(spark, src, view, grpCol, valCol, numFiles)
    } {
      AggView.sync(spark, src, view, grpCol, valCol)
    }

  /** The extremes-view form ([[AggView.bootstrapExtremes]] /
    * [[AggView.syncExtremes]]): same dispatch and refusal semantics,
    * view schema `(grp, n, total, mn, mx)`. */
  def runExtremes(spark: SparkSession, src: String, view: String,
                  grpCol: String, valCol: String,
                  numFiles: Int = 4): Option[(Long, Long)] =
    ManifestTable.dispatchConsumer(spark, view) {
      AggView.bootstrapExtremes(spark, src, view, grpCol, valCol, numFiles)
    } {
      AggView.syncExtremes(spark, src, view, grpCol, valCol)
    }
}
