package graft.ext

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.SparkSpec
import graft.functions.HashFns

/** Hashed-feature logistic classifier: trainer ≡ an in-memory reference
  * (exact integer weights), learning sanity, fixed-model decomposition,
  * and cache hygiene. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** The trainer's arithmetic replayed sequentially on collected rows —
    * same quantization, same floorDiv update. */
  private def referenceTrain(rows: Seq[(Long, String)], buckets: Int,
                             iters: Int, lrNum: Long, lrDen: Long): Array[Long] = {
    def feats(text: String): Seq[Int] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val grams = toks.indices.flatMap { i =>
        (i until math.min(i + 2, toks.length)).map(j =>
          (HashFns.mix64(HashFns.fnv1a(
            toks.slice(i, j + 1).mkString(" ").getBytes("UTF-8")))
            & (buckets - 1)).toInt)
      }
      grams.distinct.sorted :+ buckets
    }
    val fs = rows.map { case (y, tx) => (y, feats(tx)) }
    val n = fs.size.toLong
    val w = new Array[Long](buckets + 1)
    for (_ <- 0 until iters) {
      val g = new Array[Long](buckets + 1)
      for ((y, fb) <- fs) {
        val margin = fb.map(w(_)).sum
        val e = QualityClassifier.errMicro(margin, y)
        fb.foreach(b => g(b) += e)
      }
      for (b <- 0 to buckets)
        w(b) -= Math.floorDiv(g(b) * lrNum, n * lrDen)
    }
    w
  }

  private val vocabPos = Seq("good", "clear", "prose", "useful", "facts")
  private val vocabNeg = Seq("zzz", "spam", "junk", "garbled", "noise")

  test("train ≡ in-memory reference: bit-identical weights on random " +
    "corpora, at two parallelisms") {
    // other suites share this session and may hold caches — assert train
    // leaves no NEW persistent RDDs, not that the session is empty
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val rnd = new Random(41)
    for (trial <- 0 until 3) {
      val rows = (0 until 60).map { i =>
        val y = rnd.nextInt(2).toLong
        val vocab = if (y == 1) vocabPos ++ vocabNeg.take(1)
                    else vocabNeg ++ vocabPos.take(1)
        val text = Seq.fill(3 + rnd.nextInt(12))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (y, text)
      }
      val expect = referenceTrain(rows, buckets = 64, iters = 4,
        lrNum = 4, lrDen = 1)
      for (parts <- Seq(1, 7)) {
        val df = rows.toDF("y", "text").repartition(parts)
        val m = QualityClassifier.train(df, col("y") === 1, buckets = 64,
          iters = 4)
        assert(m.weights.toSeq == expect.toSeq,
          s"trial $trial parts $parts")
      }
      assert(spark.sparkContext.getPersistentRDDs.keySet == before,
        "train must release its feature cache")
    }
  }

  test("training separates a separable corpus: positive-vocab docs " +
    "score above negative-vocab docs") {
    val rnd = new Random(7)
    val rows = (0 until 80).map { i =>
      val y = (i % 2).toLong
      val vocab = if (y == 1) vocabPos else vocabNeg
      (y, Seq.fill(6 + rnd.nextInt(6))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = rows.toDF("y", "text")
    val m = QualityClassifier.train(df, col("y") === 1, buckets = 256,
      iters = 12)
    val scored = QualityClassifier.score(df, m)
      .select(col("y"), col("keep")).as[(Long, Boolean)].collect()
    val acc = scored.count { case (y, k) => (y == 1) == k }.toDouble /
      scored.length
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("fixed-model margins decompose as the sum of w(b) over distinct " +
    "buckets; empty docs get bias only") {
    val m = QualityClassifier.fixedModel(4096)
    assert(m.bias == 0L)
    // the fixed table matches its defining formula
    for (b <- Seq(0, 1, 17, 4095))
      assert(m.weights(b) == java.lang.Long.remainderUnsigned(
        HashFns.mix64(b.toLong), 2000001L) - 1000000L)
    val docs = Seq((1L, "alpha beta alpha beta gamma"), (2L, ""))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(docs, m)
      .select("doc_id", "margin_micro").as[(Long, Long)].collect().toMap
    def h(s: String) =
      (HashFns.mix64(HashFns.fnv1a(s.getBytes("UTF-8"))) & 4095L).toInt
    val bks = Seq("alpha", "beta", "gamma", "alpha beta", "beta alpha",
      "beta gamma").map(h).distinct
    assert(out(1L) == bks.map(m.weights(_)).sum)
    assert(out(2L) == 0L)
  }

  test("model save/load round-trips bit-identically, bias included") {
    val rows = (0 until 20).map(i => ((i % 2).toLong, s"tok$i the word$i"))
    val m = QualityClassifier.train(rows.toDF("y", "text"),
      col("y") === 1, buckets = 64, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_qclf_m").toString
    try {
      QualityClassifier.saveModel(spark, m, dir)
      val m2 = QualityClassifier.loadModel(spark, dir)
      assert(m2.weights.toSeq == m.weights.toSeq)
      assert(m2.buckets == m.buckets && m2.bias == m.bias)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
