package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/**
 * DSIR-style data selection via importance resampling (Xie et al.,
 * "Data Selection for Language Models via Importance Resampling",
 * NeurIPS 2023): fit hashed bag-of-ngrams unigram models over a small
 * TARGET corpus (the distribution you want, e.g. curated/wiki text) and
 * the RAW corpus, score every raw document by its log importance weight
 * log p_target(d) − log p_raw(d), then sample the k survivors with the
 * Gumbel top-k trick (Vieira 2014) so the draw is without replacement
 * with probability ∝ the importance weight.
 *
 * Engine-exactness: every λ and every score is an integer in MILLINATS
 * — per-bucket log ratios are rounded to `floor(1000·ln(·))` ONCE, so
 * all downstream arithmetic (per-document sums, Gumbel keys, the top-k
 * order) is exact integer math, identical in Spark and the DuckDB
 * oracle at any parallelism. The only floating-point ops are the `ln`
 * calls themselves, on identical doubles in an identical op order.
 *
 * Scale shape (100 TB contract):
 *  - the model fit is one tokenize+hash scan per corpus feeding a
 *    partial-aggregable `groupBy(bucket)` — at most `buckets` rows ever
 *    cross the wire, and the collected λ-table is model-state-sized
 *    (buckets × 8 bytes, like the IVF coarse quantizer);
 *  - SCORING IS A NARROW PROJECTION: the λ-table is baked into a
 *    codegen'd [[graft.functions.ExprKernels.bucketDot]] expression, so
 *    scoring 100 TB is a zero-shuffle scan;
 *  - selection is a distributed top-k (TakeOrdered), never a full sort.
 */
object Dsir {

  val DefaultBuckets = 4096

  /** λ-table + the count totals it was derived from (kept for audit). */
  case class Model(lambda: Array[Long], buckets: Int,
                   targetTotal: Long, rawTotal: Long)

  /** floor(1000·ln(x)) as a Long — the millinat quantizer. Must stay
    * bit-compatible with the oracle's
    * `CAST(floor(ln(CAST(x AS DOUBLE)) * 1000) AS BIGINT)`. */
  private[ext] def iLog1000(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1000.0).toLong

  /** Hashed 1..2-gram bucket ids of a text column (count semantics). */
  def bucketIds(text: Column, buckets: Int = DefaultBuckets,
                ngrams: Int = 2, distinct: Boolean = false): Column =
    GraftFunctions.hash_buckets(
      GraftFunctions.ngram_hash64(GraftFunctions.tokens_lc(text), ngrams),
      buckets, distinct)

  /** Per-bucket ngram occurrence counts of a corpus: one narrow
    * tokenize+hash scan, then a partial-aggregable groupBy on the int
    * bucket id — ≤ `buckets` rows reach the driver. */
  private def bucketCounts(docs: DataFrame, textCol: String, buckets: Int,
                           ngrams: Int): Array[Long] = {
    val rows = docs
      .select(explode(bucketIds(col(textCol), buckets, ngrams)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
      .collect()
    val out = new Array[Long](buckets)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /**
   * Fit the importance model: λ_b = [iLog(t_b+1) − iLog(T+B)] −
   * [iLog(r_b+1) − iLog(R+B)] — add-one-smoothed unigram log-likelihood
   * ratio over hashed ngram buckets, in millinats. Buckets unseen in
   * both corpora get the smoothed prior ratio; they never contribute to
   * a score (no gram maps there by construction).
   */
  def fit(target: DataFrame, raw: DataFrame, textCol: String = "text",
          buckets: Int = DefaultBuckets, ngrams: Int = 2): Model = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val t = bucketCounts(target, textCol, buckets, ngrams)
    val r = bucketCounts(raw, textCol, buckets, ngrams)
    val tTot = t.sum
    val rTot = r.sum
    val tNorm = iLog1000(tTot + buckets)
    val rNorm = iLog1000(rTot + buckets)
    val lambda = Array.tabulate(buckets) { b =>
      (iLog1000(t(b) + 1) - tNorm) - (iLog1000(r(b) + 1) - rNorm)
    }
    Model(lambda, buckets, tTot, rTot)
  }

  /** Score documents under a fitted model: `scoreCol` = Σ over ngram
    * occurrences of λ_bucket — a single zero-shuffle codegen projection
    * (the λ-table rides inside the expression). */
  def score(docs: DataFrame, model: Model, textCol: String = "text",
            ngrams: Int = 2, scoreCol: String = "dsir_score"): DataFrame =
    docs.withColumn(scoreCol,
      GraftFunctions.bucket_dot(
        bucketIds(col(textCol), model.buckets, ngrams), model.lambda))

  /** Deterministic Gumbel key in millinats from a non-negative id:
    * g = floor(−1000·ln(−ln(u))), u = (limbHash(id) + 0.5) / 2^32 —
    * the hash-derived uniform the sampling layer already uses, so the
    * "randomness" is reproducible across engines and runs. */
  def gumbelKey(idCol: Column): Column = {
    val u = (graft.ops.Transforms.limbHash32(idCol).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    floor(lit(-1000.0) * log(-log(u))).cast("long")
  }

  /**
   * Gumbel top-k selection over scored documents: key = score + gumbel
   * millinats (log w + G ranking ≡ sampling without replacement w.p. ∝
   * w). Ties (integer keys) break by id, so the survivor set is total-
   * order deterministic. `orderBy.limit` plans as TakeOrdered — each
   * partition keeps k candidates, the driver merges k·partitions rows.
   */
  def selectTopK(scored: DataFrame, k: Int, idCol: String = "doc_id",
                 scoreCol: String = "dsir_score",
                 keyCol: String = "sel_key"): DataFrame =
    scored
      .withColumn(keyCol, col(scoreCol) + gumbelKey(col(idCol)))
      .orderBy(col(keyCol).desc, col(idCol))
      .limit(k)

  /**
   * Persist a fitted model (fit ONCE on this quarter's target/raw
   * sample, score every weekly crawl against it — the same
   * build-once/query-many contract as the dedup and IVF indexes). The
   * λ-table is `buckets` rows of exact integers, so a reloaded model
   * scores bit-identically.
   */
  def saveModel(spark: SparkSession, m: Model, path: String): Unit = {
    import spark.implicits._
    m.lambda.zipWithIndex
      .map { case (l, b) => (b, l, m.buckets, m.targetTotal, m.rawTotal) }
      .toSeq
      .toDF("b", "lam", "buckets", "target_total", "raw_total")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("b", "lam", "buckets", "target_total", "raw_total").collect()
    require(rows.nonEmpty, s"empty DSIR model at $path")
    val buckets = rows.head.getInt(2)
    val lambda = new Array[Long](buckets)
    rows.foreach(r => lambda(r.getInt(0)) = r.getLong(1))
    Model(lambda, buckets, rows.head.getLong(3), rows.head.getLong(4))
  }
}
