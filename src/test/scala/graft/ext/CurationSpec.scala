package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Caching

/** Curation layer: repeated-chunk stripping, Bloom-prefiltered
  * decontamination, bigram reference scoring, SemDeDup pairs. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 4-word chunks: doc 0/1 share their first chunk verbatim (aligned),
  // doc 2 is unique, doc 3 is empty, doc 4 is ALL boilerplate (both its
  // chunks also open docs 0 and 1 — df 3).
  private lazy val chunkDocs: DataFrame = Seq(
    (0L, "alpha beta gamma delta one two three four"),
    (1L, "alpha beta gamma delta five six seven eight"),
    (2L, "nine ten eleven twelve thirteen"),
    (3L, ""),
    (4L, "alpha beta gamma delta")
  ).toDF("doc_id", "text")

  test("repeatedChunkStrip drops shared chunks, keeps order, covers " +
    "empty and fully-stripped docs") {
    spark.catalog.clearCache() // leftovers from other suites
    val out = Caching.scoped {
      val df = Curation.repeatedChunkStrip(chunkDocs, chunkWords = 4, maxDf = 2)
      df.as[(Long, String, Long, Long)].collect().toList
    }.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == (("one two three four", 1L, 1L)))
    assert(out(1L) == (("five six seven eight", 1L, 1L)))
    assert(out(2L) == (("nine ten eleven twelve thirteen", 2L, 0L)))
    assert(out(3L) == (("", 0L, 0L))) // zero chunks, still present
    assert(out(4L) == (("", 0L, 1L))) // fully stripped
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "scoped chunk cache must be released")
  }

  test("repeatedChunkStrip only drops at the declared df threshold") {
    val out = Caching.scoped {
      Curation.repeatedChunkStrip(chunkDocs, chunkWords = 4, maxDf = 4)
        .agg(sum("n_dropped")).as[Long].head()
    }
    assert(out == 0L) // max df in the corpus is 3 < 4
  }

  test("bloomDecontaminate is exactly the anti-join, even with a " +
    "saturated filter (false positives verified away)") {
    val docs = spark.read.parquet(sf("documents"))
      .select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val heldOut = docs.filter(col("doc_id") % 10 === 0)
    val exact = corpus
      .join(heldOut.select("text").distinct(), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    // generous filter: FP rate ~fpp
    val loose = Curation.bloomDecontaminate(corpus, heldOut,
      expectedItems = 10000L).select("doc_id").as[Long].collect().toSet
    assert(loose == exact)
    // deliberately undersized filter: most probes are false positives,
    // the verify join must still produce the exact result
    val tight = Curation.bloomDecontaminate(corpus, heldOut,
      expectedItems = 2L, fpp = 0.5).select("doc_id").as[Long].collect().toSet
    assert(tight == exact)
  }

  test("bloomDecontaminate keeps everything when the held-out set is " +
    "empty, and null texts survive as never-contaminated") {
    val corpus = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("doc_id", "text")
    val emptyHeld = corpus.filter(lit(false))
    assert(Curation.bloomDecontaminate(corpus, emptyHeld,
      expectedItems = 10L).count() == 3L)
    val held = Seq((10L, "b")).toDF("doc_id", "text")
    val kept = Curation.bloomDecontaminate(corpus, held,
      expectedItems = 10L).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L)) // "b" dropped; the null-text row survives
  }

  test("bloom mightContain has no false negatives on the held-out set") {
    val docs = spark.read.parquet(sf("documents")).select("text")
    val heldOut = docs.limit(50)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(1000L, 0.01)
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        org.apache.spark.sql.graftbridge.Bridge.expression(xxhash64(col("text"))),
        org.apache.spark.sql.catalyst.expressions.Literal(1000L),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression()
    val bytes = heldOut
      .select(org.apache.spark.sql.graftbridge.Bridge.column(agg))
      .head().getAs[Array[Byte]](0)
    val misses = heldOut
      .filter(!Curation.mightContain(bytes, col("text"))).count()
    assert(misses == 0L)
  }

  test("bigramRefScore matches a naive in-memory bigram model") {
    val corpus = Seq(
      (1L, "a b c a b"), // bigrams: "a b" x2, "b c", "c a"
      (2L, "zz yy"), // unseen bigram
      (3L, "a") // fewer than two tokens
    ).toDF("doc_id", "text")
    val ref = Seq(
      (10L, "a b c"), // model: "a b" -> 1, "b c" -> 1
      (20L, "a b a b") // model: "a b" -> +2, "b a" -> 1
    ).toDF("doc_id", "text")
    val out = Curation.bigramRefScore(corpus, ref)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: "a b" hits 3 twice, "b c" hits 1, "c a" hits 0 → 7 / 4
    assert(out(1L) == ((7L, 4L, 7.0 / 4.0)))
    assert(out(2L) == ((0L, 1L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  // Orthogonal-ish centroids; vectors engineered so assignment and the
  // within-cluster pairs are hand-checkable.
  private val semCentroids: Array[Array[Float]] = Array(
    Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
  private lazy val semVecs: DataFrame = Seq(
    (1L, Seq(1f, 0.1f, 0f, 0f)),
    (2L, Seq(0.9f, 0.2f, 0f, 0f)),
    (3L, Seq(0.1f, 1f, 0f, 0f)),
    (4L, Seq(0f, 1f, 0.1f, 0f)),
    (5L, Seq(1f, 1f, 0f, 0f)) // exact tie → first max → cluster 1
  ).toDF("vec_id", "embedding")

  test("persisted bloom index: probing the stored filter+digests equals " +
    "the in-session bloomDecontaminate and the plain anti-join; an " +
    "empty held-out index passes everything") {
    val corpus = Seq(
      (0L, "alpha beta gamma"), (1L, "delta epsilon"), (2L, "zeta eta"),
      (3L, "theta iota kappa"), (4L, "delta epsilon")
    ).toDF("doc_id", "text")
    val held = Seq((100L, "delta epsilon"), (101L, "unseen text"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_bloom_idx")
    try {
      Curation.buildBloomIndex(held, s"$idx/h", expectedItems = 100L)
      val fromIdx = Curation.bloomDecontaminateFromIndex(corpus, s"$idx/h")
        .select("doc_id").as[Long].collect().toSet
      val inSession = Curation.bloomDecontaminate(corpus, held,
          expectedItems = 100L)
        .select("doc_id").as[Long].collect().toSet
      val anti = corpus.join(held.select("text").distinct(),
          Seq("text"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      assert(fromIdx == anti && inSession == anti)
      assert(fromIdx == Set(0L, 2L, 3L))

      Curation.buildBloomIndex(held.limit(0), s"$idx/e", expectedItems = 100L)
      val empty = Curation.bloomDecontaminateFromIndex(corpus, s"$idx/e")
        .select("doc_id").as[Long].collect().toSet
      assert(empty == Set(0L, 1L, 2L, 3L, 4L))
    } finally {
      graft.io.Fs.deleteRecursively(idx)
    }
  }

  test("edge inputs: null text and null source flow through the new " +
    "composition operators without dropping or throwing") {
    // null source forms its own window partition; null text scores a
    // deterministic quality and digests to sha2(NULL) = null
    val docs = Seq[(java.lang.Long, String, String)](
      (1L, null, "real text here"), (2L, "a.com", null),
      (3L, "a.com", "more real text")
    ).toDF("doc_id", "source", "text")
    val capped = Curation.sourceQualityCap(
        docs.select(col("doc_id"), col("source"),
          coalesce(length(col("text")).cast("double"), lit(0.0)).as("q")),
        quality = col("q"), maxPerSource = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(capped == Set(1L, 2L, 3L))

    // corpusDiff: null text digests to null → "changed" when compared to
    // a real digest, "unchanged" only when BOTH sides are null? sha2 of
    // null is null and null === null is false in SQL → classified
    // "changed" (conservative: re-process rather than silently keep)
    val diff = Curation.corpusDiff(
        docs.select("doc_id", "text"), docs.select("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    assert(diff(1L) == "unchanged" && diff(3L) == "unchanged")
    assert(diff(2L) == "changed")

    // temperatureMixture with a single group: rate = min(1, target/n)
    val one = Seq((0L, "x"), (1L, "x"), (2L, "x")).toDF("doc_id", "lang")
    val kept = Curation.temperatureMixture(one,
      hash = pmod(col("doc_id") * 1000000007L, lit(4294967296L)),
      targetDocs = 1000.0).count()
    assert(kept == 3L) // rate clamps to 1.0 → everything kept

    // temperatureMixture treats a NULL group as a real group (null-safe
    // join): with a generous target nothing is dropped, including the
    // null-lang docs a plain equi-join would silently lose
    val withNull = Seq[(java.lang.Long, String)](
      (0L, "x"), (1L, "x"), (2L, null), (3L, null), (4L, null))
      .toDF("doc_id", "lang")
    val keptNull = Curation.temperatureMixture(withNull,
      hash = pmod(col("doc_id") * 1000000007L, lit(4294967296L)),
      targetDocs = 1000.0)
      .select("doc_id").as[Long].collect().toSet
    assert(keptNull == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("fuzz: corpusDiff statuses equal an in-memory snapshot compare " +
    "on random id/content overlaps") {
    val rnd = new scala.util.Random(7341)
    for (trial <- 0 until 3) {
      val n = 40 + rnd.nextInt(80)
      val oldRows = (0L until n.toLong).filter(_ => rnd.nextBoolean())
        .map(id => (id, s"text $id v${rnd.nextInt(2)}"))
      val newRows = (0L until n.toLong).filter(_ => rnd.nextBoolean())
        .map(id => (id, s"text $id v${rnd.nextInt(2)}"))
      val got = Curation.corpusDiff(
          oldRows.toDF("doc_id", "text").repartition(3),
          newRows.toDF("doc_id", "text").repartition(2))
        .as[(Long, String)].collect().toMap
      val om = oldRows.toMap
      val nm = newRows.toMap
      val expect = (om.keySet ++ nm.keySet).map { id =>
        id -> ((om.get(id), nm.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _ => "changed"
        })
      }.toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("fuzz: sourceQualityCap keeps exactly the top-N per source by " +
    "(quality desc, id) — ties, singleton sources, N larger than a " +
    "source all covered") {
    val rnd = new scala.util.Random(8421)
    for (trial <- 0 until 3) {
      val n = 50 + rnd.nextInt(100)
      val rows = (0L until n.toLong).map { id =>
        // few distinct quality values → plenty of ties
        (id, s"src${rnd.nextInt(6)}", rnd.nextInt(4) * 0.25)
      }
      val cap = 1 + rnd.nextInt(8)
      val got = Curation.sourceQualityCap(
          rows.toDF("doc_id", "source", "q").repartition(3 + trial),
          quality = col("q"), maxPerSource = cap)
        .select("doc_id", "source", "quality", "rank_in_source")
        .as[(Long, String, Double, Long)].collect().toSet
      val expect = rows.groupBy(_._2).flatMap { case (src, docs) =>
        docs.sortBy { case (id, _, q) => (-q, id) }.take(cap)
          .zipWithIndex.map { case ((id, _, q), i) =>
            (id, src, q, (i + 1).toLong)
          }
      }.toSet
      assert(got == expect, s"trial $trial cap $cap")
    }
  }

  test("fuzz: temperatureMixture keeps exactly the docs whose limb hash " +
    "clears the √n-proportional rate, and flattens head vs tail") {
    def limbHash(id: Long): Long =
      ((id % 2097152L) * 2654435761L
        + ((id / 2097152L) % 2097152L) * 2246822519L
        + (id / 4398046511104L) * 3266489917L) % 4294967296L
    val limbHashExpr = expr(
      """pmod(pmod(doc_id, 2097152) * 2654435761L
        |   + pmod(doc_id DIV 2097152, 2097152) * 2246822519L
        |   + (doc_id DIV 4398046511104) * 3266489917L, 4294967296L)"""
        .stripMargin)
    val rnd = new scala.util.Random(1001)
    for (trial <- 0 until 3) {
      // one head group, several tails — sizes differ by ~an order
      val sizes = Map("head" -> (400 + rnd.nextInt(200)),
        "t1" -> (20 + rnd.nextInt(20)), "t2" -> (10 + rnd.nextInt(10)))
      val rows = sizes.toSeq.sortBy(_._1).flatMap { case (g, m) =>
        (0 until m).map(_ => g)
      }.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      val target = 100.0
      val got = Curation.temperatureMixture(
          rows.toDF("doc_id", "lang").repartition(4),
          hash = limbHashExpr, targetDocs = target, groupCol = "lang")
        .select("doc_id").as[Long].collect().toSet

      // in-memory mirror: integer micro-unit weights, exact same doubles
      val nOf = rows.groupBy(_._2).map { case (g, d) => g -> d.size.toLong }
      val wOf = nOf.map { case (g, n) =>
        g -> math.floor(math.sqrt(n.toDouble) * 1000000L + 0.5).toLong
      }
      val sumW = wOf.values.sum
      val rateOf = nOf.map { case (g, n) =>
        g -> math.min(1.0,
          target * wOf(g).toDouble / sumW.toDouble / n.toDouble)
      }
      val expect = rows.filter { case (id, g) =>
        limbHash(id) < math.floor(rateOf(g) * 4294967296L).toLong
      }.map(_._1).toSet
      assert(got == expect, s"trial $trial")
      // flattening: a tail group's keep RATE must exceed the head's
      assert(rateOf("t2") > rateOf("head"), s"trial $trial rates $rateOf")
    }
  }

  test("semanticClusters assigns nearest centroid, ties to the first") {
    val cl = Similarity.semanticClusters(semVecs, semCentroids)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(cl(1L) == 1L && cl(2L) == 1L)
    assert(cl(3L) == 2L && cl(4L) == 2L)
    assert(cl(5L) == 1L)
  }

  test("semanticDedupPairs emits exactly the within-cluster pairs over " +
    "the threshold") {
    val pairs = Similarity.semanticDedupPairs(semVecs, semCentroids,
      threshold = 0.9)
      .select("cluster", "id_a", "id_b").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs == Set((1L, 1L, 2L), (2L, 3L, 4L)))
  }

  test("semanticDedupPairs ≡ brute-force pairs restricted to cluster " +
    "co-membership (real embeddings, trained centroids)") {
    val emb = spark.read.parquet(sf("embeddings"))
    val cents = Similarity.trainCentroids(emb, numCentroids = 4)
    val sem = Similarity.semanticDedupPairs(emb, cents, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cl = Similarity.semanticClusters(emb, cents)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val brute = Dedup.embeddingNearDupBrute(emb, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => cl(a) == cl(b) }.toSet
    assert(sem == brute)
    assert(sem.nonEmpty, "test corpus should produce at least one pair")
  }
}
