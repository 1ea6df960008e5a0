package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions, HashFns}

/** DSIR importance resampling: kernel ≡ joined-string hashing, model
  * semantics, millinat exactness, and Gumbel top-k determinism. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "pack my box with five dozen liquor jugs"),
    (2L, "the quick brown fox again and again"),
    (3L, ""),
    (5L, "sphinx of black quartz judge my vow"),
    (7L, "the the the the the"),
    (10L, "quick brown foxes judge the lazy dog"),
    (20L, "five quartz jugs over black sphinx")
  ).toDF("doc_id", "text")

  test("ngram_hash64 matches mix64(fnv1a(joined string)) for every " +
    "unigram and bigram, in sweep order") {
    val rows = docs.filter(length(col("text")) > 0)
      .select(col("text"),
        GraftFunctions.ngram_hash64(GraftFunctions.tokens_lc(col("text")), 2)
          .as("h"))
      .as[(String, Seq[Long])].collect()
    for ((text, hs) <- rows) {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val expect = toks.indices.flatMap { i =>
        (i until math.min(i + 2, toks.length)).map { j =>
          HashFns.mix64(HashFns.fnv1a(
            toks.slice(i, j + 1).mkString(" ").getBytes("UTF-8")))
        }
      }
      assert(hs == expect, s"text: $text")
    }
  }

  test("hash_buckets: count mode keeps multiplicity, distinct mode is " +
    "the sorted bucket set") {
    val (all, dist) = docs.filter(col("doc_id") === 7L)
      .select(
        GraftFunctions.hash_buckets(
          GraftFunctions.ngram_hash64(
            GraftFunctions.tokens_lc(col("text")), 2), 64).as("a"),
        GraftFunctions.hash_buckets(
          GraftFunctions.ngram_hash64(
            GraftFunctions.tokens_lc(col("text")), 2), 64,
          distinct = true).as("d"))
      .as[(Seq[Int], Seq[Int])].head()
    // "the"x5 → 5 unigrams + 4 identical bigrams = 9 ids, 2 distinct
    assert(all.length == 9)
    assert(all.toSet == dist.toSet)
    assert(dist == dist.sorted && dist.length == 2)
    assert(dist.forall(b => b >= 0 && b < 64))
  }

  test("hash_buckets distinct: the large-domain sort-dedupe path (buckets " +
    "> 4096) returns the same ascending set as count-mode distinct") {
    val B = 1 << 20 // forces the sorted path — no 1M-slot bitmap per row
    val rows = docs.limit(50)
      .select(
        GraftFunctions.hash_buckets(
          GraftFunctions.ngram_hash64(
            GraftFunctions.tokens_lc(col("text")), 2), B).as("a"),
        GraftFunctions.hash_buckets(
          GraftFunctions.ngram_hash64(
            GraftFunctions.tokens_lc(col("text")), 2), B,
          distinct = true).as("d"))
      .as[(Seq[Int], Seq[Int])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (all, dist) =>
      assert(dist == all.distinct.sorted)
      assert(dist.forall(b => b >= 0 && b < B))
    }
  }

  test("fit + score ≡ an in-memory model: integer millinat scores " +
    "decompose as sum of per-bucket λ over gram occurrences") {
    val target = docs.filter(col("doc_id") % 10 === 0)
    val raw = docs.filter(col("doc_id") % 10 =!= 0)
    val B = 256
    val m = Dsir.fit(target, raw, buckets = B)

    def grams(text: String): Seq[Int] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.indices.flatMap { i =>
        (i until math.min(i + 2, toks.length)).map { j =>
          (HashFns.mix64(HashFns.fnv1a(
            toks.slice(i, j + 1).mkString(" ").getBytes("UTF-8"))) &
            (B - 1)).toInt
        }
      }
    }
    val tCounts = new Array[Long](B)
    target.as[(Long, String)].collect()
      .foreach { case (_, tx) => grams(tx).foreach(b => tCounts(b) += 1) }
    val rCounts = new Array[Long](B)
    raw.as[(Long, String)].collect()
      .foreach { case (_, tx) => grams(tx).foreach(b => rCounts(b) += 1) }
    def iL(x: Long) = math.floor(math.log(x.toDouble) * 1000.0).toLong
    val tN = iL(tCounts.sum + B)
    val rN = iL(rCounts.sum + B)
    val lamRef = Array.tabulate(B)(b =>
      (iL(tCounts(b) + 1) - tN) - (iL(rCounts(b) + 1) - rN))
    assert(m.lambda.toSeq == lamRef.toSeq)
    assert(m.targetTotal == tCounts.sum && m.rawTotal == rCounts.sum)

    val scored = Dsir.score(raw, m, ngrams = 2)
      .select("doc_id", "text", "dsir_score")
      .as[(Long, String, Long)].collect()
    for ((_, tx, sc) <- scored)
      assert(sc == grams(tx).map(lamRef(_)).sum, s"doc: $tx")
    // empty doc scores exactly 0
    assert(scored.find(_._2 == "").get._3 == 0L)
  }

  test("gumbel top-k: deterministic total order, k rows, keys = score + " +
    "hash-derived gumbel") {
    val target = docs.filter(col("doc_id") % 10 === 0)
    val raw = docs.filter(col("doc_id") % 10 =!= 0)
    val m = Dsir.fit(target, raw, buckets = 256)
    val scored = Dsir.score(raw, m)
    val a = Dsir.selectTopK(scored, 3).select("doc_id", "sel_key")
      .as[(Long, Long)].collect().toSeq
    val b = Dsir.selectTopK(scored.repartition(7), 3)
      .select("doc_id", "sel_key").as[(Long, Long)].collect().toSeq
    assert(a == b, "selection must not depend on partitioning")
    assert(a.length == 3)
    // keys decompose: sel_key - dsir_score = gumbel(doc_id)
    val g = Dsir.selectTopK(scored, 3)
      .select(col("doc_id"), (col("sel_key") - col("dsir_score")).as("g"))
      .as[(Long, Long)].collect().toMap
    def limbRef(id: Long): Long =
      ((id % 2097152) * 2654435761L + ((id / 2097152) % 2097152) * 2246822519L
        + (id / 4398046511104L) * 3266489917L) % 4294967296L
    for ((id, gv) <- g) {
      val u = (limbRef(id) + 0.5) / 4294967296.0
      assert(gv == math.floor(-1000.0 * math.log(-math.log(u))).toLong)
    }
  }

  test("fuzz: fit + score ≡ the in-memory model on random corpora " +
    "(empty docs, repeated tokens, numerics, long runs)") {
    val rnd = new scala.util.Random(1735)
    val vocab = (0 until 40).map(i => s"w$i") ++
      Seq("the", "a", "42", "x", "", "longtokenxxxxxxxxxxxxxxxxxx")
    for (trial <- 0 until 3) {
      val rows = (0L until 50L).map { id =>
        val len = rnd.nextInt(30)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = rows.toDF("doc_id", "text").repartition(1 + trial * 3)
      val target = df.filter(col("doc_id") % 5 === 0)
      val raw = df.filter(col("doc_id") % 5 =!= 0)
      val B = 128
      val m = Dsir.fit(target, raw, buckets = B)
      def grams(text: String): Seq[Int] = {
        val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        toks.indices.flatMap { i =>
          (i until math.min(i + 2, toks.length)).map { j =>
            (HashFns.mix64(HashFns.fnv1a(
              toks.slice(i, j + 1).mkString(" ").getBytes("UTF-8"))) &
              (B - 1)).toInt
          }
        }
      }
      val t = new Array[Long](B)
      val r = new Array[Long](B)
      rows.foreach { case (id, tx) =>
        val c = if (id % 5 == 0) t else r
        grams(tx).foreach(b => c(b) += 1)
      }
      def iL(x: Long) = math.floor(math.log(x.toDouble) * 1000.0).toLong
      val lamRef = Array.tabulate(B)(b =>
        (iL(t(b) + 1) - iL(t.sum + B)) - (iL(r(b) + 1) - iL(r.sum + B)))
      assert(m.lambda.toSeq == lamRef.toSeq, s"trial $trial")
      val scored = Dsir.score(raw, m).select("doc_id", "dsir_score")
        .as[(Long, Long)].collect().toMap
      rows.filter(_._1 % 5 != 0).foreach { case (id, tx) =>
        assert(scored(id) == grams(tx).map(lamRef(_)).sum,
          s"trial $trial doc $id")
      }
    }
  }

  test("model save/load round-trips bit-identically (fit once, score " +
    "every crawl)") {
    val target = docs.filter(col("doc_id") % 10 === 0)
    val raw = docs.filter(col("doc_id") % 10 =!= 0)
    val m = Dsir.fit(target, raw, buckets = 256)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_m").toString
    try {
      Dsir.saveModel(spark, m, dir)
      val m2 = Dsir.loadModel(spark, dir)
      assert(m2.lambda.toSeq == m.lambda.toSeq)
      assert(m2.buckets == m.buckets)
      assert(m2.targetTotal == m.targetTotal && m2.rawTotal == m.rawTotal)
      val a = Dsir.score(raw, m).select("doc_id", "dsir_score")
        .as[(Long, Long)].collect().toMap
      val b = Dsir.score(raw, m2).select("doc_id", "dsir_score")
        .as[(Long, Long)].collect().toMap
      assert(a == b)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
