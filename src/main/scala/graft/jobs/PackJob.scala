package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

/**
 * Curated corpus → loader-ready dataset layout, as one runnable job —
 * the last mile between [[CurationJob]]'s output and a training loader:
 *
 *   token-count → context-window packing with in-bin offsets
 *   (`Queries.packBins(withOffset = true)`) → shard assignment BY BIN →
 *   shard-partitioned parquet sorted by (lang, bin, offset) + manifest
 *
 * Sharding is by (lang, bin), never by document: a context window must
 * live wholly inside one shard or the loader cannot assemble it. The
 * shard key is `xxhash64(lang, bin) % numShards` — deterministic on any
 * cluster layout, and bins (not documents) are what balance across
 * shards. Files are written `partitionBy(shard)` and sorted by
 * (lang, bin, offset) within each file, so a loader reads its shard
 * directory sequentially and sees every window's documents adjacent and
 * in offset order.
 *
 * Writes under `outDir`:
 *   - `dataset/shard=N/` — (doc_id, lang, text, n_tokens, bin, offset)
 *   - `manifest/`        — per shard: n_docs, n_bins, n_tokens (what a
 *                          loader checks before it maps the epoch)
 */
object PackJob {

  /** args: curatedParquet outDir [tokenBudget] [numShards] */
  def main(args: Array[String]): Unit = {
    val Array(curatedPath, outDir) = args.take(2)
    val budget = args.lift(2).map(_.toLong).getOrElse(512L)
    val shards = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.create("graft-pack")
    try run(spark, curatedPath, outDir, budget, shards)
    finally spark.stop()
  }

  def run(spark: SparkSession, curatedPath: String, outDir: String,
          tokenBudget: Long = 512L, numShards: Int = 8,
          filesPerShard: Int = 1): Unit = {
    val curated = spark.read.parquet(curatedPath)
    val docs =
      if (curated.columns.contains("lang")) curated
      else curated.withColumn("lang", lit("all"))

    val withTokens = graft.Queries.packBins(
      docs.select(col("doc_id"), col("lang"), col("text")),
      budget = tokenBudget,
      measure = TextAnalysis.bpeishTokenCount(col("text")),
      measureName = "n_tokens", withOffset = true)

    val sharded = docs.select("doc_id", "text")
      .join(withTokens, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"),
        col("bin"), col("offset"),
        pmod(xxhash64(col("lang"), col("bin")), lit(numShards.toLong))
          .as("shard"))

    // range-partition on (shard, lang, bin): `filesPerShard` tasks can
    // serve ONE shard (a 100 TB shard is many files, not one task), each
    // file covers a contiguous window range, and sortWithinPartitions
    // keeps every window's documents adjacent in offset order
    sharded
      .repartitionByRange(numShards * math.max(filesPerShard, 1),
        col("shard"), col("lang"), col("bin"))
      .sortWithinPartitions("shard", "lang", "bin", "offset")
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/dataset")

    spark.read.parquet(s"$outDir/dataset")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("lang"), col("bin")).as("n_bins"),
        sum(col("n_tokens")).as("n_tokens"))
      .write.mode("overwrite").parquet(s"$outDir/manifest")
  }
}
