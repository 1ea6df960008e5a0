package graft.jobs

import java.io.PrintWriter
import java.net.ServerSocket
import java.nio.file.Files

import graft.SparkSpec
import graft.io.{FakeDb, Sources}
import graft.streaming.StreamingJobs

/**
 * Embedded integration harness for the job wiring that unit tests can't
 * reach: the REAL socket source against a local ServerSocket, and a job
 * `main` run end-to-end through its config loading, file source, and
 * JDBC sink via a fake `java.sql.Driver` registered with DriverManager —
 * no external Kafka/Postgres needed.
 */
class JobsIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("S3 socket source streams lines from a live local socket") {
    val server = new ServerSocket(0) // ephemeral port
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      out.println("to be or not to be")
      out.println("be it so")
      out.flush()
      // keep the connection open until the test closes the server;
      // the socket source treats EOF as stream end
      while (!server.isClosed) Thread.sleep(50)
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val q = StreamingJobs.startMemory(
      StreamingJobs.wordCount(
        Sources.socketLines(spark, "localhost", server.getLocalPort)),
      "socket_wc_test", org.apache.spark.sql.streaming.OutputMode.Update())
    try {
      // socket data arrives asynchronously — poll until the counts land
      val deadline = System.currentTimeMillis() + 30000
      var totals = Map.empty[String, Long]
      while (totals.getOrElse("be", 0L) < 3L
          && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        totals = spark.table("socket_wc_test").collect()
          .map(r => r.getString(0) -> r.getLong(1))
          .groupBy(_._1).map { case (w, rs) => w -> rs.map(_._2).max }
        if (totals.getOrElse("be", 0L) < 3L) Thread.sleep(200)
      }
      assert(totals("be") == 3L, s"got $totals")
      assert(totals("to") == 2L && totals("so") == 1L)
    } finally {
      q.stop()
      server.close()
    }
  }

  test("BatchJdbcUpsertJob.main runs file → parse → K3 upsert via a registered fake driver") {
    java.sql.DriverManager.registerDriver(FakeJdbcDriver)
    FakeDb.reset()
    val dir = Files.createTempDirectory("graft-job-it")
    val src = dir.resolve("sensors.txt")
    Files.writeString(src,
      "sensor_1,1547718199,35.8\nsensor_6,1547718201,15.4\nsensor_1,1547718207,36.3\n")
    val props = dir.resolve("job.properties")
    Files.writeString(props,
      s"""SRC_FILE_PATH=${src}
         |JDBC_URL=jdbc:graftfake:mem
         |JDBC_USER=u
         |JDBC_PASSWORD=p
         |TABLE=t_it
         |""".stripMargin)

    BatchJdbcUpsertJob.main(Array(props.toString))

    val s1 = FakeDb.table.get("sensor_1")
    assert(s1 != null && s1.iteration == 2)
    assert(math.abs(s1.temp - (35.8f + 36.3f)) < 1e-4)
    assert(FakeDb.table.get("sensor_6").iteration == 1)
  }

  test("IncrementalDedupJob runs the weekly-crawl loop end-to-end: " +
    "bootstrap, probe, survivors + cap stats next to results, append") {
    val root = java.nio.file.Files.createTempDirectory("graft_incjob")
    def p(s: String) = s"$root/$s"
    try {
      Seq(
        (0L, "the quick brown fox jumps over the lazy dog tonight"),
        (1L, "an utterly unrelated document about spark engines today"))
        .toDF("doc_id", "text").write.parquet(p("corpus"))
      Seq(
        (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
        (11L, "completely novel text about streaming incremental dedup pipelines"))
        .toDF("doc_id", "text").write.parquet(p("crawl1"))
      Seq(
        (20L, "completely novel text about streaming incremental dedup pipelines"), // dup of survivor 11
        (21L, "another genuinely fresh document mentioning nothing seen before"))
        .toDF("doc_id", "text").write.parquet(p("crawl2"))

      IncrementalDedupJob.run(spark, p("corpus"), p("crawl1"), p("idx"),
        p("out1"), threshold = 0.5)
      assert(spark.read.parquet(p("out1/dup_pairs"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet == Set((0L, 10L)))
      assert(spark.read.parquet(p("out1/survivors"))
        .select("doc_id").as[Long].collect().toSet == Set(11L))
      // the cap counters were recorded as a table next to the results
      val cap = spark.read.parquet(p("out1/cap_stats")).collect().head
      assert(cap.getLong(0) > 0 && cap.getLong(2) == 0) // buckets, no drops

      // run 2: crawl2's dup of crawl1's APPENDED survivor is caught
      IncrementalDedupJob.run(spark, p("corpus"), p("crawl2"), p("idx"),
        p("out2"), threshold = 0.5)
      assert(spark.read.parquet(p("out2/dup_pairs"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet == Set((11L, 20L)))
      assert(spark.read.parquet(p("out2/survivors"))
        .select("doc_id").as[Long].collect().toSet == Set(21L))
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }

  test("StreamingIncrementalDedupJob watches a directory: each parquet " +
    "drop probes the index, records its epoch's pairs, and appends " +
    "survivors for later drops to dedup against") {
    import graft.ext.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_sdedupjob")
    def p(s: String) = s"$root/$s"
    try {
      Seq(
        (0L, "the quick brown fox jumps over the lazy dog tonight"),
        (1L, "an utterly unrelated document about spark engines today"))
        .toDF("doc_id", "text").write.parquet(p("corpus"))
      Dedup.buildDedupIndex(spark.read.parquet(p("corpus")), p("idx"),
        numHashes = 128, bands = 32)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p("watch")))

      // the job watches for flat parquet FILE drops (the production
      // shape); stage each crawl to a temp dir and move its part files in
      def drop(name: String, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(p(s"stage_$name"))
        scala.util.Using.resource(java.nio.file.Files.list(
          java.nio.file.Paths.get(p(s"stage_$name"))))(
          _.filter(_.toString.endsWith(".parquet"))
            .forEach(f => java.nio.file.Files.move(f,
              java.nio.file.Paths.get(p(s"watch/$name.parquet")))))
      }
      val q = StreamingIncrementalDedupJob.start(spark, p("watch"), p("idx"),
        p("out"), p("ckpt"), threshold = 0.5)
      try {
        drop("crawl1", Seq(
          (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
          (11L, "completely novel text about streaming incremental dedup pipelines")))
        q.processAllAvailable()
        drop("crawl2", Seq(
          (20L, "completely novel text about streaming incremental dedup pipelines"))) // dup of appended 11
        q.processAllAvailable()
      } finally q.stop()

      // per-epoch pair record: epoch 0 flagged (0,10); epoch 1 flagged
      // (11,20) — which requires epoch 0's survivor append to have landed
      val allPairs = spark.read
        .parquet(p("out/dup_pairs/epoch_0"), p("out/dup_pairs/epoch_1"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(allPairs == Set((0L, 10L), (11L, 20L)), allPairs.toString)
      // index state: survivors 11 appended exactly once, dup 10/20 never
      val bandIds = spark.read.parquet(
        graft.io.Tables.resolveComponent(spark, p("idx/bands")))
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      assert(bandIds.keySet == Set(0L, 1L, 11L), bandIds.toString)
      assert(bandIds.values.forall(_ == 32L), bandIds.toString)
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }

  test("StreamingIncrementalDedupJob kill/recovery: a crash AFTER the " +
    "index append but BEFORE the checkpoint commit replays the epoch " +
    "without double-appending; survivors identical to a clean run") {
    import graft.ext.Dedup
    import graft.ops.Caching
    val root = java.nio.file.Files.createTempDirectory("graft_sdedupkill")
    def p(s: String) = s"$root/$s"
    val crawl1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
      (11L, "completely novel text about streaming incremental dedup pipelines"))
    val crawl2 = Seq(
      (20L, "completely novel text about streaming incremental dedup pipelines"), // dup of appended 11
      (21L, "another genuinely fresh document mentioning nothing seen before"))
    try {
      Seq(
        (0L, "the quick brown fox jumps over the lazy dog tonight"),
        (1L, "an utterly unrelated document about spark engines today"))
        .toDF("doc_id", "text").write.parquet(p("corpus"))
      Dedup.buildDedupIndex(spark.read.parquet(p("corpus")), p("idx"),
        numHashes = 128, bands = 32)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p("watch")))
      def drop(name: String, rows: Seq[(Long, String)]): Unit = {
        rows.toDF("doc_id", "text").coalesce(1).write.parquet(p(s"stage_$name"))
        scala.util.Using.resource(java.nio.file.Files.list(
          java.nio.file.Paths.get(p(s"stage_$name"))))(
          _.filter(_.toString.endsWith(".parquet"))
            .forEach(f => java.nio.file.Files.move(f,
              java.nio.file.Paths.get(p(s"watch/$name.parquet")))))
      }
      def runStream(): Unit = {
        val q = StreamingIncrementalDedupJob.start(spark, p("watch"), p("idx"),
          p("out"), p("ckpt"), threshold = 0.5)
        try q.processAllAvailable() finally q.stop()
      }

      // epoch 0 commits cleanly
      drop("crawl1", crawl1)
      runStream()
      assert(Dedup.epochCommitted(spark, p("idx"), "weeklycrawl", 0L))

      // THE CRASH: epoch 1's foreachBatch ran to completion — dup pairs
      // recorded, index append marker-committed — but the engine died
      // before writing the checkpoint commit log, so on restart the
      // batch is replayed. Emulate by performing the exact body the job
      // runs (same queryId, same epoch id the restart will assign)
      // without letting the streaming checkpoint see it.
      Caching.scoped {
        val batch = crawl2.toDF("doc_id", "text")
        val pairs = Caching.register(
          Dedup.minhashLshPairsAgainstIndex(batch, p("idx"), threshold = 0.5))
        pairs.write.mode("overwrite").parquet(p("out/dup_pairs/epoch_1"))
        val drops = Dedup.incrementalDropIds(pairs,
          batch.select(org.apache.spark.sql.functions.col("doc_id")),
          "doc_id")
        assert(Dedup.appendToDedupIndexEpoch(
          batch.join(drops, Seq("doc_id"), "left_anti"), p("idx"), 1L,
          "weeklycrawl"), "crashed attempt must have performed the append")
      }

      // restart from the SAME checkpoint with crawl2 now visible: the
      // engine replays it as epoch 1; the committed marker must make the
      // replay a wholesale no-op on the index
      drop("crawl2", crawl2)
      runStream()

      val bandIds = spark.read.parquet(
        graft.io.Tables.resolveComponent(spark, p("idx/bands")))
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      assert(bandIds.keySet == Set(0L, 1L, 11L, 21L), bandIds.toString)
      assert(bandIds.values.forall(_ == 32L),
        s"replay double-appended band rows: $bandIds")
      val pairs1 = spark.read.parquet(p("out/dup_pairs/epoch_1"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs1 == Set((11L, 20L)), pairs1.toString)

      // identical to a clean (no-crash) twin run over the same drops
      Seq("idx2", "watch2", "out2", "ckpt2").foreach(d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p(d))))
      Dedup.buildDedupIndex(spark.read.parquet(p("corpus")), p("idx2"),
        numHashes = 128, bands = 32)
      crawl1.toDF("doc_id", "text").coalesce(1).write.mode("append")
        .parquet(p("watch2"))
      val q2 = StreamingIncrementalDedupJob.start(spark, p("watch2"),
        p("idx2"), p("out2"), p("ckpt2"), threshold = 0.5)
      try {
        q2.processAllAvailable()
        crawl2.toDF("doc_id", "text").coalesce(1).write.mode("append")
          .parquet(p("watch2"))
        q2.processAllAvailable()
      } finally q2.stop()
      val cleanIds = spark.read.parquet(
        graft.io.Tables.resolveComponent(spark, p("idx2/bands")))
        .select("id").distinct().as[Long].collect().toSet
      assert(cleanIds == bandIds.keySet,
        s"recovered survivors != clean-run survivors: $cleanIds vs ${bandIds.keySet}")
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }

  test("TakedownJob removes docs from the corpus and every index in one " +
    "run: probes masked immediately, files clean after compactNow, " +
    "idempotent on re-run") {
    import graft.ext.{Dedup, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft_takedownjob")
    def p(s: String) = s"$root/$s"
    try {
      val corpus = Seq(
        (0L, "the quick brown fox jumps over the lazy dog tonight"),
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "an utterly unrelated document about spark engines today"))
        .toDF("doc_id", "text")
      corpus.write.parquet(p("corpus"))
      Seq(0L).toDF("doc_id").write.parquet(p("ids"))
      Dedup.buildDedupIndex(corpus, p("mh"), numHashes = 128, bands = 32)
      Dedup.buildExactIndex(corpus, p("x"))
      val emb = spark.read.parquet(sf("embeddings"))
      Similarity.buildIvfIndex(emb.filter(org.apache.spark.sql.functions.col("vec_id") < 50), p("ann"),
        numCentroids = 4, kmeansIters = 1)
      Seq(0L).toDF("doc_id").write.mode("overwrite").parquet(p("ids"))

      TakedownJob.run(spark, p("corpus"), p("ids"), p("out"),
        dedupIdx = Some(p("mh")), exactIdx = Some(p("x")),
        annIdx = Some(p("ann")), compactNow = true)

      // report + corpus rewrite
      val rep = spark.read.parquet(p("out/report")).collect().head
      assert((rep.getLong(0), rep.getLong(1), rep.getLong(2)) == ((1L, 1L, 2L)))
      assert(spark.read.parquet(p("out/corpus"))
        .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

      // dedup probe: a dup of removed 0 pairs only with surviving 1
      val probe = Seq((100L,
        "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text")
      val pairs = graft.ops.Caching.scoped {
        Dedup.minhashLshPairsAgainstIndex(probe, p("mh"), threshold = 0.5)
          .as[(Long, Long, Double)].collect().map(x => (x._1, x._2)).toSet
      }
      assert(pairs == Set((1L, 100L)))
      // exact probe: identical content is canonical again
      assert(Dedup.exactSurvivorsAgainstIndex(probe, p("x"))
        .select("doc_id").as[Long].collect().toSet == Set(100L))
      // ANN probe: vec 0 gone from every top-k
      val ann = Similarity.ivfTopKFromIndex(spark,
        p("ann"), emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), 5, nprobe = 4)
        .select("neighbor_id").as[Long].collect().toSet
      assert(!ann.contains(0L))
      // compactNow applied physically: tombstone sidecars cleared
      Seq("mh", "x", "ann").foreach(d =>
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(p(s"$d/tombstones"))), d))

      // idempotent: re-run over the REWRITTEN corpus matches nothing
      TakedownJob.run(spark, p("out/corpus"), p("ids"), p("out2"),
        dedupIdx = Some(p("mh")))
      val rep2 = spark.read.parquet(p("out2/report")).collect().head
      assert((rep2.getLong(0), rep2.getLong(1), rep2.getLong(2))
        == ((1L, 0L, 2L)))
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }

  test("CurationJob runs the whole prep pipeline: strip → quality → " +
    "decontam → dedup-vs-index → pack, with a per-stage funnel, and " +
    "run 2 dedups against run 1's appended survivors") {
    val root = java.nio.file.Files.createTempDirectory("graft_curjob")
    def p(s: String) = s"$root/$s"
    spark.catalog.clearCache() // leftovers from other suites
    try {
      // all texts lowercase single-space so the chunk-strip reassembly is
      // the identity on untouched docs
      Seq(
        (1L, "the alpha machine dances beside eleven crimson theorem meadows tonight"), // survives everything
        (2L, "every winter the violet harbor collects seventeen quiet copper lanterns"), // exact copy of held-out → decontam
        (3L, "breaking news subscribe now"), // pure boilerplate (= d4's first chunk) → fully stripped
        (4L, "breaking news subscribe now genuine fresh insight appears amid the quiet valley floor tonight"), // keeps its tail
        (5L, "oh the alpha machine dances beside eleven crimson theorem meadows tonight"), // near-dup of 1, chunk-shifted
        (6L, "zz qq xx")) // survives strip, fails the quality gate
        .toDF("doc_id", "text").write.parquet(p("crawl1"))
      Seq((100L, "every winter the violet harbor collects seventeen quiet copper lanterns"))
        .toDF("doc_id", "text").write.parquet(p("held"))

      CurationJob.run(spark, p("crawl1"), p("held"), p("idx"), p("out1"),
        minQuality = 0.8, threshold = 0.5, chunkWords = 4,
        bloomIndexDir = p("bidx"))
      // run 1 persisted the decontamination model (filter + digests)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(p("bidx/digests"))))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(p("bidx/bloom"))))
      val curated1 = spark.read.parquet(p("out1/curated"))
      assert(curated1.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
      // doc 4 exits with ONLY its non-boilerplate tail, token-counted and binned
      val d4 = curated1.filter($"doc_id" === 4L)
        .select("text", "n_tokens", "bin").as[(String, Long, Long)].head()
      assert(d4 == (("genuine fresh insight appears amid the quiet valley floor tonight", 10L, 0L)))
      val funnel = spark.read.parquet(p("out1/funnel"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
      // one doc out per active stage; the disabled rule/DSIR stages
      // repeat the preceding count
      assert(funnel == ((6L, 5L, 4L, 4L, 3L, 2L, 2L)))
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        "the job's scoped caches must be released")

      // run 2: a near-dup of run 1's APPENDED survivor is caught by the
      // index probe; the fresh doc survives
      Seq(
        (30L, "ah the alpha machine dances beside eleven crimson theorem meadows tonight"),
        (31L, "completely original closing statement about the silver meridian harbor lights"))
        .toDF("doc_id", "text").write.parquet(p("crawl2"))
      // run 2 probes the STORED bloom index (build-once/probe-many)
      CurationJob.run(spark, p("crawl2"), p("held"), p("idx"), p("out2"),
        minQuality = 0.8, threshold = 0.5, chunkWords = 4,
        bloomIndexDir = p("bidx"))
      assert(spark.read.parquet(p("out2/curated"))
        .select("doc_id").as[Long].collect().toSet == Set(31L))
      val funnel2 = spark.read.parquet(p("out2/funnel"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
      assert(funnel2 == ((2L, 2L, 2L, 2L, 2L, 1L, 1L)))
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }

  test("PackJob writes a loader-ready shard layout: every context " +
    "window lives wholly inside one shard, offsets are the exact prefix " +
    "sums, and the manifest matches the data") {
    val root = java.nio.file.Files.createTempDirectory("graft_packjob")
    def p(s: String) = s"$root/$s"
    try {
      // two langs, small budget → several bins per lang
      val docs = (0L until 40L).map { id =>
        (id, if (id % 3 == 0) "de" else "en",
          Seq.fill(3 + (id % 5).toInt)(s"w$id").mkString(" "))
      }
      docs.toDF("doc_id", "lang", "text").write.parquet(p("curated"))

      PackJob.run(spark, p("curated"), p("out"), tokenBudget = 20L,
        numShards = 4)

      val ds = spark.read.parquet(p("out/dataset"))
        .select("doc_id", "lang", "bin", "offset", "n_tokens", "shard")
        .as[(Long, String, Long, Long, Long, Long)].collect()
      assert(ds.length == 40)
      // bin-wholeness: one shard per (lang, bin)
      ds.groupBy(r => (r._2, r._3)).foreach { case (key, rows) =>
        assert(rows.map(_._6).distinct.length == 1, s"split window $key")
      }
      // offsets are the within-(lang) running prefix sums mod budget and
      // each doc's bin is its start position DIV budget
      ds.groupBy(_._2).foreach { case (_, rows) =>
        var pos = 0L
        rows.sortBy(r => (r._1 % 16, r._1)).foreach { r =>
          assert(r._3 == pos / 20L && r._4 == pos % 20L, s"doc ${r._1}")
          pos += r._5
        }
      }
      val manifest = spark.read.parquet(p("out/manifest"))
        .as[(Long, Long, Long, Long)].collect()
      assert(manifest.map(_._2).sum == 40L)
      assert(manifest.map(_._4).sum == ds.map(_._5).sum)
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }

  test("AuditJob writes the full audit bundle with exact counts and " +
    "releases its caches") {
    val root = java.nio.file.Files.createTempDirectory("graft_audit")
    def p(s: String) = s"$root/$s"
    spark.catalog.clearCache()
    try {
      Seq(
        (1L, "en", "a.com", "the quick brown fox jumps over the lazy dog"),
        (2L, "en", "a.com", "the quick brown fox jumps over the lazy dog"),
        (3L, "de", "b.de", "ein ganz anderes dokument hier"))
        .toDF("doc_id", "lang", "source", "text").write.parquet(p("docs"))
      Seq((0L, Seq(3.0f, 4.0f), 1), (1L, Seq(0.0f, 0.0f), 1),
          (2L, Seq(1.0f, 0.0f), 2))
        .toDF("vec_id", "embedding", "label").write.parquet(p("emb"))

      AuditJob.run(spark, p("docs"), p("out"), p("emb"))

      val stats = spark.read.parquet(p("out/corpus_stats"))
        .as[(Long, Long, Long, Long, Long)].head()
      assert(stats._1 == 3L && stats._2 == 2L && stats._3 == 2L)
      val langs = spark.read.parquet(p("out/lang_dist"))
        .select("lang", "n_docs").as[(String, Long)].collect().toMap
      assert(langs == Map("en" -> 2L, "de" -> 1L))
      val srcs = spark.read.parquet(p("out/source_dist"))
        .as[(String, Long)].collect().toMap
      assert(srcs == Map("a.com" -> 2L, "b.de" -> 1L))
      val hist = spark.read.parquet(p("out/dup_histogram"))
        .as[(Long, Long)].collect().toMap
      assert(hist == Map(2L -> 1L, 1L -> 1L)) // docs 1≡2 dup, doc 3 unique
      val rates = spark.read.parquet(p("out/quality_rates"))
      assert(rates.columns.contains("n_keep") &&
        rates.select("docs").as[Long].head() == 3L)
      val ep = spark.read.parquet(p("out/embed_profile"))
        .select("label", "n_vecs", "norm_nanos", "n_zero")
        .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      // label 1: norms 5.0 (3-4-5 triangle) + 0.0 with one zero vector
      assert(ep(1) == ((1, 2L, 5000000000L, 1L)))
      assert(ep(2) == ((2, 1L, 1000000000L, 0L)))
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        "the job's scoped caches must be released")
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }

  test("CurationJob optional stages: the Gopher rule gate drops its " +
    "violator and DSIR selection keeps the top-k nearest the target " +
    "distribution") {
    val root = java.nio.file.Files.createTempDirectory("graft_curjob_sel")
    def p(s: String) = s"$root/$s"
    spark.catalog.clearCache()
    try {
      // ≥ 50 distinct-shingle words with stopwords so the Gopher defaults
      // pass; doc 3 is a 200-word exact-repetition loop → rep_ok fails
      def prose(seed: Int): String =
        (0 until 60).map(i => s"the item$seed$i value").mkString(" ")
      Seq(
        (1L, prose(1) + " curated reference style phrasing here"),
        (2L, prose(2) + " utterly different vocabulary altogether domain"),
        (3L, ("the quick brown fox " * 50).trim)) // fails rep_ok
        .toDF("doc_id", "text").write.parquet(p("crawl"))
      Seq((100L, "no overlap with the held out corpus whatsoever"))
        .toDF("doc_id", "text").write.parquet(p("held"))
      // target distribution shares doc 1's distinctive suffix vocabulary
      Seq((200L, "curated reference style phrasing here"),
          (201L, "more curated reference style phrasing"))
        .toDF("doc_id", "text").write.parquet(p("target"))

      CurationJob.run(spark, p("crawl"), p("held"), p("idx"), p("out"),
        minQuality = 0.1, threshold = 0.5, chunkWords = 4,
        applyGopherRules = true, dsirTargetPath = p("target"), dsirKeep = 1)
      val funnel = spark.read.parquet(p("out/funnel"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
      // 3 in; strip/quality keep 3; rules drop doc 3; decontam/dedup keep
      // 2; DSIR keeps the 1 doc closest to the target distribution
      assert(funnel == ((3L, 3L, 3L, 2L, 2L, 2L, 1L)))
      assert(spark.read.parquet(p("out/curated"))
        .select("doc_id").as[Long].collect().toSet == Set(1L))
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        "the job's scoped caches must be released")
    } finally {
      graft.io.Fs.deleteRecursively(root)
    }
  }
}

/** Minimal java.sql.Driver returning the reflective FakeDb connection for
  * `jdbc:graftfake:` URLs, so job mains exercise their real
  * DriverManager.getConnection path. */
object FakeJdbcDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftfake:")
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (acceptsURL(url)) FakeDb.connect() else null
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getGlobal
}
