package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only end-to-end drive of the library surface (not part of the
  * library API): every ext-layer operator run against the real testdata. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    import graft.ext._

    println("== Dedup.exact ==")
    Dedup.exact(docs).orderBy(desc("dup_count")).show(5)
    println("exact survivors: " + Dedup.exactSurvivors(docs).count() + " of " + docs.count())

    println("== Dedup.minhashLshPairs (threshold 0.5) ==")
    val mh = Dedup.minhashLshPairs(docs, threshold = 0.5)
    mh.orderBy(desc("jaccard")).show(10)

    println("== Dedup.simhashPairs (hamming<=8) ==")
    Dedup.simhashPairs(docs, maxHamming = 8).orderBy("hamming").show(10)

    println("== Dedup.ngramJaccardPairs (threshold 0.3) ==")
    Dedup.ngramJaccardPairs(docs, threshold = 0.3).orderBy(desc("jaccard")).show(10)

    println("== Dedup.embeddingNearDupPairs vs brute (threshold 0.8) ==")
    val lsh = Dedup.embeddingNearDupPairs(emb, threshold = 0.8)
    val brute = Dedup.embeddingNearDupBrute(emb, threshold = 0.8)
    println(s"lsh pairs=${lsh.count()} brute pairs=${brute.count()}")

    println("== Similarity.bruteForceTopK (5 queries, k=3) ==")
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.bruteForceTopK(emb, queries, 3).orderBy("query_id", "score").show(20)

    println("== Similarity.ivfTopK (5 queries, k=3) ==")
    Similarity.ivfTopK(emb, queries, 3).orderBy("query_id", "score").show(20)

    println("== Similarity persisted index (build → reload → query) ==")
    val ivfDir = java.nio.file.Files.createTempDirectory("drive_ivf_").toString
    Similarity.buildIvfIndex(emb, ivfDir, numCentroids = 8, indexFiles = 4)
    Similarity.ivfTopKFromIndex(spark, ivfDir, queries, 3)
      .orderBy("query_id", "score").show(20)

    println("== IVF-PQ: build → reload → ADC probe → exact re-rank ==")
    val pqDir = java.nio.file.Files.createTempDirectory("drive_pq_").toString
    Similarity.buildPqIndex(emb, pqDir, numCentroids = 8, m = 16, ksub = 64,
      indexFiles = 4)
    Similarity.pqTopKFromIndexRerank(spark, pqDir, emb, queries, 3,
      rerank = 20, nprobe = 7).orderBy("query_id", "score").show(20)

    println("== Curation.sourceQualityCap / temperatureMixture ==")
    Curation.sourceQualityCap(
      docs.select(col("doc_id"), col("source"),
        TextAnalysis.qualityScoreOf(col("text"),
          TextAnalysis.tokens(col("text"))).as("q")),
      quality = col("q"), maxPerSource = 5)
      .groupBy("source").count().orderBy("source").show(5)
    Curation.temperatureMixture(
      docs.select("doc_id", "lang", "n_chars"),
      hash = expr("""pmod(pmod(doc_id, 2097152) * 2654435761L
        |   + pmod(doc_id DIV 2097152, 2097152) * 2246822519L
        |   + (doc_id DIV 4398046511104) * 3266489917L, 4294967296L)"""
        .stripMargin),
      targetDocs = 100.0)
      .groupBy("lang").count().orderBy("lang").show(10)

    println("== Dedup.capStats (observable LSH candidate cap) ==")
    Dedup.capStatsReset(spark)
    Dedup.minhashLshPairs(docs, threshold = 0.5)
      .write.format("noop").mode("overwrite").save()
    println(Dedup.capStats(spark))

    println("== TextAnalysis.qualityFeatures ==")
    TextAnalysis.qualityFeatures(docs).show(5)
    println("lang distribution (pred vs actual):")
    TextAnalysis.qualityFeatures(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "lang_pred").count().orderBy(desc("count")).show(10)

    println("== Multimodal ==")
    val media = Multimodal.fromDocuments(docs)
    Multimodal.extractMeta(media).show(3)
    Multimodal.decodeFeatures(spark, media).show(3)
    Multimodal.frameSample(media, 4).groupBy("modality").count().show()
    println("decode_ok rate (synthetic text payloads → all stub):")
    Multimodal.decodeFeatures(spark, media)
      .groupBy("modality", "decode_ok").count().show()
    Multimodal.extractVideoMeta(media).groupBy("decode_ok").count().show()

    // ------------------------------------------------ round-5 operators
    val r5 = java.nio.file.Files.createTempDirectory("graft_drive_r5").toString
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val crawl = docs.filter(col("doc_id") % 5 === 0)

    println("== incremental dedup: build → probe → survivors → append → compact ==")
    Dedup.buildDedupIndex(corpus, s"$r5/mh", numHashes = 128, bands = 32)
    println("probe pairs: " +
      Dedup.minhashLshPairsAgainstIndex(crawl, s"$r5/mh", threshold = 0.5).count())
    val surv = Dedup.minhashLshSurvivorsAgainstIndex(crawl, s"$r5/mh",
      threshold = 0.5)
    println(s"survivors: ${surv.count()} of ${crawl.count()}")
    Dedup.appendToDedupIndex(surv, s"$r5/mh")
    Dedup.compactDedupIndex(spark, s"$r5/mh", indexFiles = 4)
    println("post-compaction probe of an empty crawl: " +
      Dedup.minhashLshPairsAgainstIndex(crawl.limit(0), s"$r5/mh").count())

    println("== exact-digest index: build → survivors → append ==")
    Dedup.buildExactIndex(corpus, s"$r5/x")
    val xs = Dedup.exactSurvivorsAgainstIndex(crawl, s"$r5/x")
    println(s"exact survivors: ${xs.count()} of ${crawl.count()}")
    Dedup.appendToExactIndex(xs, s"$r5/x")

    println("== IVF append + compaction + semantic decontam ==")
    Similarity.appendToIvfIndex( // fresh ids — appends must be disjoint
      emb.limit(50).withColumn("vec_id", col("vec_id") + 1000000L), ivfDir)
    Similarity.compactIvfIndex(spark, ivfDir, indexFiles = 4)
    Similarity.compactPqIndex(spark, pqDir, indexFiles = 4)
    println("decontam survivors: " + Similarity.semanticDecontaminate(
      emb.filter(col("vec_id") % 5 =!= 0),
      emb.filter(col("vec_id") % 5 === 0), threshold = 0.4).count())

    println("== BPE: learn (exact + batched) → encode ==")
    val merges = Bpe.learnMerges(docs, numMerges = 8)
    println("merges: " + merges.mkString(" "))
    println("batched(4): " +
      Bpe.learnMerges(docs, numMerges = 8, batchSize = 4).mkString(" "))
    Bpe.encodeCounts(docs, merges).show(5)

    println("== z-ordered layout ==")
    graft.io.Tables.writeZOrdered(
      docs.select(col("doc_id").as("a"), col("n_chars").as("b")),
      s"$r5/z", 4, "a", "b")
    println("z rows: " + spark.read.parquet(s"$r5/z").count())

    // ------------------------------------------- round-5 curation layer
    println("== Curation.repeatedChunkStrip ==")
    val stripped = Curation.repeatedChunkStrip(docs, chunkWords = 10, maxDf = 2)
    stripped.agg(sum("n_dropped"), count(when(col("n_kept") === 0, 1))).show()

    println("== Curation.bloomDecontaminate vs exact ==")
    val bl = Curation.bloomDecontaminate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0), expectedItems = 10000L)
    println(s"bloom survivors: ${bl.count()} of ${docs.filter(col("doc_id") % 10 =!= 0).count()}")

    println("== Curation.bigramRefScore ==")
    Curation.bigramRefScore(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0))
      .orderBy(desc("ref_score")).show(5)

    println("== Similarity.semanticDedupPairs (trained-here centroids) ==")
    val cents = Similarity.trainCentroids(emb, numCentroids = 8)
    println("semdedup pairs: " +
      Similarity.semanticDedupPairs(emb, cents, threshold = 0.4).count())

    println("== Dsir: fit → score (narrow scan) → gumbel top-k ==")
    val dsirTarget = docs.filter(col("doc_id") % 10 === 0)
    val dsirRaw = docs.filter(col("doc_id") % 10 =!= 0)
    val dsirModel = Dsir.fit(dsirTarget, dsirRaw)
    println(s"model: target grams=${dsirModel.targetTotal} " +
      s"raw grams=${dsirModel.rawTotal} " +
      s"nonzero λ=${dsirModel.lambda.count(_ != 0L)}/${dsirModel.buckets}")
    val dsirScored = Dsir.score(dsirRaw, dsirModel)
    dsirScored.orderBy(desc("dsir_score")).select("doc_id", "dsir_score").show(5)
    Dsir.selectTopK(dsirScored, 10).select("doc_id", "dsir_score", "sel_key").show(10)

    println("== TextAnalysis.gopherFlags (rule-level pass rates) ==")
    val gf = TextAnalysis.gopherFlags(docs)
    gf.agg(count(lit(1)).as("docs"),
      sum(col("words_ok").cast("long")).as("words_ok"),
      sum(col("mean_len_ok").cast("long")).as("mean_len_ok"),
      sum(col("stop_ok").cast("long")).as("stop_ok"),
      sum(col("symbol_ok").cast("long")).as("symbol_ok"),
      sum(col("rep_ok").cast("long")).as("rep_ok"),
      sum(col("keep").cast("long")).as("keep")).show()

    println("== QualityClassifier: train on silver labels → score ==")
    val qm = QualityClassifier.train(docs,
      TextAnalysis.qualityScore(col("text")) >= 0.75,
      buckets = 1024, iters = 5)
    println(s"bias=${qm.bias} nonzero w=${qm.weights.count(_ != 0L)}/${qm.weights.length}")
    val qs = QualityClassifier.score(docs, qm)
    qs.groupBy("keep").count().show()
    qs.orderBy(desc("margin_micro")).select("doc_id", "margin_micro", "keep").show(5)

    spark.stop()
  }
}
