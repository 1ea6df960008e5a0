package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.ops.Caching

/**
 * The corpus audit bundle as ONE runnable job — every table an operator
 * wants on day one of owning a training corpus, written side by side so
 * a single run answers "what is this data": per-language/source
 * composition, rule-level quality pass rates, duplicate-cluster
 * histogram, and (optionally) the embedding-table profile. Each piece is
 * also a declared, individually-oracled query; this job is the
 * composition.
 *
 * Writes under `outDir`:
 *   - `corpus_stats/`   one row: docs, langs, sources, chars, tokens
 *   - `lang_dist/`      per-language doc count + char volume
 *   - `source_dist/`    per-source doc count (the domain-cap input)
 *   - `quality_rates/`  one row: per-Gopher-rule pass counts + keep
 *   - `dup_histogram/`  duplicate-cluster size → cluster count
 *   - `embed_profile/`  (with an embeddings path) per-label profile
 *
 * Scale shape: one tokenize scan feeds the quality rates (cached,
 * spillable, released on exit); the digest groupBy is the only
 * corpus-wide shuffle; everything else is metadata-sized aggregation.
 */
object AuditJob {

  /** args: docsParquet outDir [embeddingsParquet] */
  def main(args: Array[String]): Unit = {
    val Array(docsPath, outDir) = args.take(2)
    val embPath = args.lift(2).getOrElse("")
    val spark = graft.GraftSession.create("graft-audit")
    try run(spark, docsPath, outDir, embPath)
    finally spark.stop()
  }

  def run(spark: SparkSession, docsPath: String, outDir: String,
          embPath: String = ""): Unit = {
    val docs = spark.read.parquet(docsPath)
    val withLang = docs.columns.contains("lang")
    val withSource = docs.columns.contains("source")

    Caching.scoped {
      val lang = if (withLang) col("lang") else lit("all")
      val source = if (withSource) col("source") else lit("all")
      val base = Caching.register(docs.select(col("doc_id"),
        lang.as("lang"), source.as("source"), col("text"),
        length(col("text")).cast("long").as("n_chars_actual"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens")))

      base.agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("source")).as("n_sources"),
        sum(col("n_chars_actual")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"))
        .write.mode("overwrite").parquet(s"$outDir/corpus_stats")

      base.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars_actual")).as("total_chars"))
        .write.mode("overwrite").parquet(s"$outDir/lang_dist")

      base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .write.mode("overwrite").parquet(s"$outDir/source_dist")

      // rule-level pass rates: the first thing to look at before
      // choosing curation thresholds
      val flags = TextAnalysis.gopherFlags(base.select("doc_id", "text"))
      val boolCols = flags.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.BooleanType => f.name
      }.toSeq
      flags.agg(count(lit(1)).as("docs"),
          boolCols.map(c =>
            sum(when(col(c), 1L).otherwise(0L)).as(s"n_$c")): _*)
        .write.mode("overwrite").parquet(s"$outDir/quality_rates")

      graft.ext.Profile.dupHistogram(base)
        .write.mode("overwrite").parquet(s"$outDir/dup_histogram")

      if (embPath.nonEmpty)
        graft.ext.Profile.embedProfile(spark.read.parquet(embPath))
          .write.mode("overwrite").parquet(s"$outDir/embed_profile")
    }
  }
}
