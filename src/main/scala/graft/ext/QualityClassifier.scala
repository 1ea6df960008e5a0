package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.GraftFunctions
import graft.ops.Caching

/**
 * Hashed-feature document quality classifier (the fastText-style linear
 * model of the CCNet/LLaMA curation pipelines, Joulin et al. 2017):
 * presence features over hashed 1..2-gram buckets, trained as a logistic
 * regression by batch gradient descent, applied as a zero-shuffle scoring
 * scan. The standard use: label a small silver set (a heuristic, or
 * curated-vs-crawl like DSIR's target split), train, then keep documents
 * whose margin clears a threshold.
 *
 * DETERMINISTIC AT ANY PARALLELISM — the usual float-sum nondeterminism
 * of distributed GD is removed by fixed-point arithmetic:
 *  - weights and margins are integer MICRO-units (1e-6);
 *  - each document's gradient contribution is quantized to an integer
 *    `floor((σ(margin) − y) · 1e6)` BEFORE the cross-document sum, so the
 *    per-bucket reduction is an exact associative long sum;
 *  - the update `w −= ⌊G · lrNum / (n · lrDen)⌋` is integer division.
 * The same bits fall out on local[4], a 1000-executor cluster, and the
 * in-memory reference trainer the fuzz suite replays.
 *
 * Scale shape (100 TB contract):
 *  - the bias is feature `buckets` (always present), so ONE partial-
 *    aggregable `groupBy(bucket)` per iteration yields every gradient
 *    including the bias — ≤ buckets+1 rows cross the wire per pass;
 *  - the tokenized/hashed feature table is computed once and persisted
 *    (spillable) across iterations, released before returning;
 *  - scoring bakes the weight table into the codegen'd `bucket_dot`
 *    expression: a narrow projection, no join, no shuffle.
 */
object QualityClassifier {

  /** Trained model: `weights(b)` for buckets 0..buckets-1 in micro-units,
    * `weights(buckets)` is the bias. */
  case class Model(weights: Array[Long], buckets: Int) {
    require(weights.length == buckets + 1, "weights must include the bias slot")
    def bias: Long = weights(buckets)
  }

  /** Presence features: distinct hashed 1..2-gram buckets plus the
    * always-on bias feature id `buckets`. */
  private def featureIds(text: Column, buckets: Int, ngrams: Int): Column =
    concat(
      Dsir.bucketIds(text, buckets, ngrams, distinct = true),
      array(lit(buckets)))

  /** σ(margin) − y, quantized to integer micro-units — the per-document
    * gradient factor. Kept `private[ext]` so the fuzz reference replays
    * the identical arithmetic. */
  private[ext] def errMicro(marginMicro: Long, y: Long): Long =
    math.floor((1.0 / (1.0 + math.exp(-(marginMicro.toDouble) / 1e6))
      - y.toDouble) * 1e6).toLong

  /**
   * Train by `iters` full-batch GD passes. `labelCol` must evaluate to
   * 0/1. Each iteration is one scan of the persisted feature table: the
   * codegen'd margin projection feeds an exploded, partial-aggregable
   * per-bucket sum of quantized errors (bias included via the sentinel
   * feature), collected as ≤ buckets+1 rows.
   */
  def train(docs: DataFrame, labelCol: Column, textCol: String = "text",
            buckets: Int = 1024, ngrams: Int = 2, iters: Int = 10,
            lrNum: Long = 4L, lrDen: Long = 1L): Model = {
    require(iters > 0 && lrNum > 0 && lrDen > 0, "iters and lr must be positive")
    val feats = docs.select(
      labelCol.cast("long").as("y"),
      featureIds(col(textCol), buckets, ngrams).as("fb"))
    feats.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count()
      require(n > 0, "cannot train on an empty corpus")
      val w = new Array[Long](buckets + 1)
      var it = 0
      while (it < iters) {
        // margin = Σ w(b) over features (bias rides as feature `buckets`)
        val err = feats.select(
          floor((lit(1.0) / (lit(1.0) +
            exp(-(GraftFunctions.bucket_dot(col("fb"), w).cast("double")) / lit(1e6)))
            - col("y").cast("double")) * lit(1e6)).cast("long").as("err"),
          col("fb"))
        val grads = err
          .select(col("err"), explode(col("fb")).as("b"))
          .groupBy("b").agg(sum("err").as("g"))
          .collect()
        grads.foreach { r =>
          val b = r.getInt(0)
          w(b) -= Math.floorDiv(r.getLong(1) * lrNum, n * lrDen)
        }
        it += 1
      }
      Model(w, buckets)
    } finally feats.unpersist(blocking = false)
  }

  /** Score documents: `margin_micro` (integer micro-units, exact) and
    * `keep` = margin > 0. A zero-shuffle codegen projection — the weight
    * table rides inside the expression. */
  def score(docs: DataFrame, model: Model, textCol: String = "text",
            ngrams: Int = 2): DataFrame =
    docs.withColumn("margin_micro",
        GraftFunctions.bucket_dot(
          featureIds(col(textCol), model.buckets, ngrams), model.weights))
      .withColumn("keep", col("margin_micro") > 0)

  /**
   * Deterministic pseudo-random weight table for the ORACLED fixed-model
   * scoring query: w(b) = mix64(b) mod 2000001 − 1000000 (unsigned
   * domain), bias 0 — the SQL mirror recomputes the identical table from
   * the bucket ids, so the whole scoring path is oracle-checked without
   * shipping a 4096-row literal into the query text.
   */
  def fixedModel(buckets: Int = 4096): Model = {
    val w = new Array[Long](buckets + 1)
    var b = 0
    while (b < buckets) {
      w(b) = java.lang.Long.remainderUnsigned(
        graft.functions.HashFns.mix64(b.toLong), 2000001L) - 1000000L
      b += 1
    }
    Model(w, buckets)
  }

  /** Persist / reload a trained model (train once on the labeled sample,
    * score every crawl — integer weights reload bit-identically). Slot
    * `buckets` is the bias. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, m: Model,
                path: String): Unit = {
    import spark.implicits._
    m.weights.zipWithIndex
      .map { case (w, b) => (b, w, m.buckets) }.toSeq
      .toDF("b", "w_micro", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("b", "w_micro", "buckets").collect()
    require(rows.nonEmpty, s"empty classifier model at $path")
    val buckets = rows.head.getInt(2)
    val w = new Array[Long](buckets + 1)
    rows.foreach(r => w(r.getInt(0)) = r.getLong(1))
    Model(w, buckets)
  }
}
