package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}
import graft.ops.Caching

/**
 * Takedown/opt-out as ONE runnable job — the operational story behind the
 * per-index `deleteFrom*` primitives: given a list of doc ids to remove,
 * rewrite the corpus without them and tombstone every index that was
 * built from it, so the removal is visible EVERYWHERE immediately (probes
 * mask tombstones) and applied physically at each index's next
 * compaction. The exact-digest index is content-keyed, so the removed
 * docs' digests are fetched from the corpus BEFORE the rewrite.
 *
 * Writes under `outDir`:
 *   - `corpus/` — the corpus minus the removed ids (anti-join rewrite; on
 *     a partitioned 100 TB store you would restrict the rewrite to the
 *     partitions holding the ids — the job takes the already-pruned
 *     input the same way every other job does)
 *   - `report/` — one row: ids requested, docs matched, docs remaining
 *     (requested vs matched differ when ids were already absent — the
 *     job is idempotent, re-running it converges)
 *
 * `compactNow = true` runs each index's compaction immediately after
 * tombstoning, leaving the files physically free of the removed ids in
 * the same maintenance window; default defers to the indexes' regular
 * LSM schedule (auto-compaction triggers count files, and tombstones ride
 * along whenever the next compaction fires).
 */
object TakedownJob {

  /** args: corpusParquet idsParquet outDir [dedupIdxDir] [exactIdxDir]
    * [annIdxDir] [compactNow] — empty string skips an index. */
  def main(args: Array[String]): Unit = {
    val Array(corpusPath, idsPath, outDir) = args.take(3)
    val dedupIdx = args.lift(3).filter(_.nonEmpty)
    val exactIdx = args.lift(4).filter(_.nonEmpty)
    val annIdx = args.lift(5).filter(_.nonEmpty)
    val compactNow = args.lift(6).exists(_.toBoolean)
    val spark = graft.GraftSession.create("graft-takedown")
    try run(spark, corpusPath, idsPath, outDir, dedupIdx, exactIdx, annIdx,
      compactNow)
    finally spark.stop()
  }

  def run(spark: SparkSession, corpusPath: String, idsPath: String,
          outDir: String, dedupIdx: Option[String] = None,
          exactIdx: Option[String] = None, annIdx: Option[String] = None,
          compactNow: Boolean = false): Unit = {
    val corpus = spark.read.parquet(corpusPath)
    Caching.scoped {
      // the id list is read many times (corpus anti-join + each index) —
      // pin it; takedown lists are small by nature
      val ids = Caching.register(
        spark.read.parquet(idsPath).select(col("doc_id")).distinct())
      val requested = ids.count()

      // exact index is content-keyed: fetch the doomed docs' text BEFORE
      // the corpus rewrite (after it, the content is gone). Registered:
      // the semi-join scans the full corpus, and both the tombstone write
      // and the count consume it — one scan, not two
      val matched = Caching.register(
        corpus.join(ids, Seq("doc_id"), "left_semi"))
      exactIdx.foreach(p => Dedup.deleteFromExactIndex(matched, p))
      val nMatched = matched.count()

      dedupIdx.foreach(p => Dedup.deleteFromDedupIndex(ids, p))
      annIdx.foreach(p =>
        Similarity.deleteFromAnnIndex(ids.toDF("vec_id"), p))

      val kept = corpus.join(ids, Seq("doc_id"), "left_anti")
      kept.write.mode("overwrite").parquet(s"$outDir/corpus")
      val remaining = spark.read.parquet(s"$outDir/corpus").count()

      if (compactNow) {
        dedupIdx.foreach(p => Dedup.compactDedupIndex(spark, p))
        exactIdx.foreach(p => Dedup.compactExactIndex(spark, p))
        // one family call: every live ANN component (IVF lists and/or PQ
        // codes) compacts with the shared tombstone set applied, and the
        // sidecar clears once AFTER all of them — clearing between two
        // per-component compactions would leave the second keeping
        // deleted ids physically and unmasked
        annIdx.foreach(p => Similarity.compactAnnIndex(spark, p))
      }

      import spark.implicits._
      Seq((requested, nMatched, remaining))
        .toDF("ids_requested", "docs_matched", "docs_remaining")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/report")
    }
  }
}
