package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Dedup
import graft.ops.Caching

/**
 * The weekly-crawl dedup pipeline as one runnable job (extension layer —
 * no reference counterpart; composes the round-5 incremental operators
 * the way a production corpus pipeline would):
 *
 *   1. bootstrap: if `indexDir` holds no index yet, sign+band the corpus
 *      once ([[Dedup.buildDedupIndex]]);
 *   2. probe the crawl against the stored lists — near-dup PAIRS to
 *      `outDir/dup_pairs`, SURVIVORS (crawl minus dups, keep-first) to
 *      `outDir/survivors`;
 *   3. record observability NEXT TO the results: the LSH candidate-cap
 *      counters as `outDir/cap_stats` ([[Dedup.capStatsDf]] — drops are
 *      visible, never silent);
 *   4. append the survivors to the index so the NEXT run dedups against
 *      them too.
 *
 * Idempotence note: re-running the same crawl AFTER its append will
 * report the crawl's docs as duplicates of themselves via the index —
 * feed each crawl once (ids globally unique, the index contract).
 */
object IncrementalDedupJob {

  /** args: corpusParquet crawlParquet indexDir outDir [threshold]
    * [autoCompactMaxFiles] — the last flag (0 = off) enables LSM
    * maintenance: compact the index after the append when either
    * component exceeds that many files. */
  def main(args: Array[String]): Unit = {
    val Array(corpusPath, crawlPath, indexDir, outDir) = args.take(4)
    val threshold = args.lift(4).map(_.toDouble).getOrElse(0.8)
    val autoCompactMaxFiles = args.lift(5).map(_.toInt).getOrElse(0)
    val spark = graft.GraftSession.create("graft-incremental-dedup")
    try run(spark, corpusPath, crawlPath, indexDir, outDir, threshold,
      autoCompactMaxFiles)
    finally spark.stop()
  }

  def run(spark: SparkSession, corpusPath: String, crawlPath: String,
          indexDir: String, outDir: String,
          threshold: Double = 0.8, autoCompactMaxFiles: Int = 0): Unit = {
    val params = new org.apache.hadoop.fs.Path(s"$indexDir/params")
    val fs = params.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(params))
      Dedup.buildDedupIndex(spark.read.parquet(corpusPath), indexDir,
        numHashes = 128, bands = 32)

    val crawl = spark.read.parquet(crawlPath)
    Caching.scoped { // release the crawl's LSH intermediates on exit
      Dedup.capStatsReset(spark)
      val pairs = Dedup.minhashLshPairsAgainstIndex(crawl, indexDir,
        threshold = threshold)
        .transform(df => Caching.register(df)) // pairs sink + drop set
      pairs.write.mode("overwrite").parquet(s"$outDir/dup_pairs")
      val drops = Dedup.incrementalDropIds(pairs,
        crawl.select(col("doc_id")), "doc_id")
      val survivors = crawl.join(drops, Seq("doc_id"), "left_anti")
      survivors.write.mode("overwrite").parquet(s"$outDir/survivors")
      // snapshot AFTER the dedup actions it describes
      Dedup.capStatsDf(spark).write.mode("overwrite")
        .parquet(s"$outDir/cap_stats")
      Dedup.appendToDedupIndex(
        spark.read.parquet(s"$outDir/survivors"), indexDir)
    }
    // LSM maintenance inside the job that owns the index: a weekly-crawl
    // deployment appends every run, so the run itself decides when the
    // accumulated small files warrant one compaction pass
    if (autoCompactMaxFiles > 0)
      Dedup.maybeCompactDedupIndex(spark, indexDir, autoCompactMaxFiles)
  }
}
