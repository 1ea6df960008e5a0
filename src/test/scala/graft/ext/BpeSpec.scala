package graft.ext

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

/** BPE training + inference vs a naive in-memory reference implementation
  * (same semantics, no Spark): the distributed learner must reproduce the
  * reference merge table exactly (including count tie-breaks), and the
  * encode kernel must reproduce the reference subword streams. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // --- naive reference implementation (Sennrich 2016, in-memory) ---

  private def mergeSeq(syms: Vector[String], a: String,
                       b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  // the sequential reference trainer lives in main (Bpe.learnMergesLocal)
  // — shared by this fuzz pin and the ext_bpe_learn in-engine verdict
  private def naiveLearn(wordFreq: Map[String, Long], numMerges: Int,
                         minFreq: Long): Seq[(String, String)] =
    Bpe.learnMergesLocal(wordFreq, numMerges, minFreq)

  private def naiveEncode(w: String,
                          merges: Seq[(String, String)]): Vector[String] = {
    val ranks = merges.zipWithIndex.toMap
    var parts = w.map(_.toString).toVector
    var done = parts.length < 2
    while (!done) {
      val ranked = (0 until parts.length - 1)
        .flatMap(i => ranks.get((parts(i), parts(i + 1))))
      if (ranked.isEmpty) done = true
      else {
        val (a, b) = merges(ranked.min)
        parts = mergeSeq(parts, a, b)
        done = parts.length < 2
      }
    }
    parts
  }

  private def randomDocs(rnd: Random, n: Int): Seq[String] = {
    val alphabet = "abc"
    def word() = (1 to (1 + rnd.nextInt(5)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to n).map(_ => (1 to (3 + rnd.nextInt(6))).map(_ => word()).mkString(" "))
  }

  test("distributed merge learning reproduces the naive trainer exactly " +
    "(argmax + tie-breaks) on random corpora") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val docs = randomDocs(rnd, 30)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val learned = Bpe.learnMerges(df, numMerges = 12, minFreq = 2)
      val wordFreq = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val expected = naiveLearn(wordFreq, 12, 2)
      assert(learned == expected, s"trial $trial: $learned vs $expected")
      assert(learned.nonEmpty, s"trial $trial learned nothing")

      // the encode kernel replays the learned merges canonically
      // (lowest-rank-first) — must equal the naive encoder per document
      val got = df.select(col("doc_id"),
        Bpe.encode(GraftFunctions.tokens_lc(col("text")), learned))
        .as[(Long, Seq[String])].collect().toMap
      docs.zipWithIndex.foreach { case (text, i) =>
        val want = text.split(" ").filter(_.nonEmpty)
          .flatMap(naiveEncode(_, learned)).toSeq
        assert(got(i.toLong) == want, s"trial $trial doc $i")
      }
    }
  }

  test("batched merge learning: disjoint pairs batch together, " +
    "conflicting pairs defer a round, batch=1 stays exact") {
    // two independent duplicate families: (a,b) and (c,d) never share a
    // symbol, so one batched round learns both — same table as exact
    val disjoint = Seq((0L, "ab ab ab ab ab"), (1L, "cd cd cd cd"))
      .toDF("doc_id", "text")
    val exact = Bpe.learnMerges(disjoint, numMerges = 2, minFreq = 2)
    val batched = Bpe.learnMerges(disjoint, numMerges = 2, minFreq = 2,
      batchSize = 2)
    assert(batched == exact && exact == Seq(("a", "b"), ("c", "d")))

    // "abc": (a,b) and (b,c) tie on count but CONFLICT on b — the batch
    // must take only (a,b), then learn (ab,c) the next round, exactly as
    // the sequential algorithm does
    val conflict = Seq((0L, "abc abc abc abc")).toDF("doc_id", "text")
    val exactC = Bpe.learnMerges(conflict, numMerges = 2, minFreq = 2)
    val batchedC = Bpe.learnMerges(conflict, numMerges = 2, minFreq = 2,
      batchSize = 2)
    assert(batchedC == exactC && exactC == Seq(("a", "b"), ("ab", "c")))

    // a random corpus: batch=1 goes through the same selection code and
    // must equal the default path (the exactness pin)
    val rnd = new Random(31)
    val docs = randomDocs(rnd, 20)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assert(Bpe.learnMerges(df, numMerges = 8, batchSize = 1) ==
      Bpe.learnMerges(df, numMerges = 8))
  }

  test("merge learning with a reliable checkpoint dir returns the same " +
    "table (the cluster-fault-tolerant mode) and bounds its storage") {
    val rnd = new Random(11)
    val docs = randomDocs(rnd, 25)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val plain = Bpe.learnMerges(df, numMerges = 10, minFreq = 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bpe_ckpt")
    try {
      val ckpted = Bpe.learnMerges(df, numMerges = 10, minFreq = 2,
        checkpointDir = Some(ckpt.toString))
      assert(ckpted == plain)
      // round N-1's files are deleted once round N materializes, and the
      // result is driver-side model state, so NO snapshot survives the run
      import scala.jdk.CollectionConverters._
      val remaining = scala.util.Using.resource(
        java.nio.file.Files.walk(ckpt))(_.iterator().asScala
        .count(_.getFileName.toString.startsWith("rdd-")))
      assert(remaining == 0, s"leaked checkpoint storage: $remaining dirs")
    } finally {
      graft.io.Fs.deleteRecursively(ckpt)
    }
  }

  test("fixed ext_bpe_encode table: canonical kernel encode equals " +
    "in-order single-pass replay on the real documents table — the " +
    "property the nested-replace DuckDB oracle depends on") {
    val merges = graft.Queries.BpeMerges
    def inOrder(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (parts, (a, b)) =>
        mergeSeq(parts, a, b)
      }
    val docs = spark.read.parquet(sf("documents"))
    val kernel = docs.select(col("doc_id"),
      Bpe.encode(GraftFunctions.tokens_lc(col("text")), merges))
      .as[(Long, Seq[String])].collect()
    val words = docs.select(col("doc_id"),
      GraftFunctions.tokens_lc(col("text"))).as[(Long, Seq[String])]
      .collect().toMap
    assert(kernel.nonEmpty)
    kernel.foreach { case (id, enc) =>
      assert(enc == words(id).flatMap(inOrder), s"doc $id")
    }
    // ...and the canonical kernel itself equals the canonical reference
    kernel.foreach { case (id, enc) =>
      assert(enc == words(id).flatMap(naiveEncode(_, merges)), s"doc $id")
    }
  }

  test("encodeCounts: n_bpe_tokens between word count and char count; " +
    "zero-token docs yield zero") {
    val docs = Seq((0L, "aba aba cab"), (1L, ""), (2L, "!!!"),
      (3L, "abababab")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val got = Bpe.encodeCounts(docs, merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // "aba" -> [ab, a]; "cab" -> [c, ab]: 3 words -> 2+2+2 subwords
    assert(got(0L) == (3L, 6L))
    assert(got(1L) == (0L, 0L) && got(2L) == (0L, 0L))
    // "abababab" -> ab ab ab ab -> abab abab -> 2 subwords
    assert(got(3L) == (1L, 2L))
  }
}
