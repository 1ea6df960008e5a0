package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.model.SensorReading

/** Streaming semantics T1-T7 via MemoryStream (SURVEY §5 item 2/5). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("A1 streaming word count accumulates across micro-batches (update mode)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamingJobs.startMemory(
      StreamingJobs.wordCount(in.toDF()), "wc_test", OutputMode.Update())
    try {
      in.addData("To be, or not to be")
      q.processAllAvailable()
      in.addData("that is the Question!", "be be BE")
      q.processAllAvailable()
      // update mode emits revisions; last row per word is the running total
      val totals = spark.table("wc_test").collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).map { case (w, rs) => w -> rs.map(_._2).max }
      assert(totals("be") == 5L && totals("to") == 2L && totals("question") == 1L)
    } finally q.stop()
  }

  test("A3 streaming grouped min/max revises groups as data arrives") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamingJobs.startMemory(
      StreamingJobs.minMaxBySymbolYear(in.toDF().select($"value")).toDF(),
      "minmax_test", OutputMode.Complete())
    try {
      in.addData("NYSE,ABB,2010-01-04,19.05,19.19,18.90,19.12,1720000,17.84")
      q.processAllAvailable()
      in.addData("NYSE,ABB,2010-06-04,20.00,25.00,19.00,24.00,1000000,22.00")
      q.processAllAvailable()
      val rows = spark.table("minmax_test")
        .select("symbol", "yearr", "MIN_HIGH", "MAX_HIGH")
        .as[(String, Int, Float, Float)].collect().toSet
      assert(rows == Set(("ABB", 2010, 19.19f, 25.0f)))
    } finally q.stop()
  }

  test("watermark closes event-time windows and drops late data (append mode)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamingJobs.startMemory(
      StreamingJobs.hourlyEventCounts(events, lateness = "10 minutes"),
      "ev_test", OutputMode.Append())
    def t(s: String) = Timestamp.valueOf(s)
    try {
      in.addData((t("2024-01-01 10:05:00"), "click", 1.0),
        (t("2024-01-01 10:20:00"), "click", 2.0))
      q.processAllAvailable() // watermark ≈ 10:10 — window [10,11) still open
      in.addData((t("2024-01-01 11:30:00"), "view", 1.0))
      q.processAllAvailable() // watermark 11:20 > 11:00 — [10,11) finalized
      in.addData((t("2024-01-01 10:40:00"), "click", 99.0)) // late → dropped
      in.addData((t("2024-01-01 13:00:00"), "view", 1.0))   // push watermark
      q.processAllAvailable()
      val w10 = spark.table("ev_test")
        .filter(col("window.start") === t("2024-01-01 10:00:00"))
        .select("cnt", "total_value").as[(Long, Double)].collect()
      assert(w10.toSeq == Seq((2L, 3.0))) // late 99.0 never counted
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-sensor state across batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[SensorReading]
    val q = StreamingJobs.startMemory(
      StreamingJobs.sensorRunningState(in.toDS()).toDF(),
      "state_test", OutputMode.Update())
    try {
      in.addData(SensorReading("s1", 100L, 10.0f), SensorReading("s1", 200L, 5.0f))
      q.processAllAvailable()
      in.addData(SensorReading("s1", 300L, 2.5f))
      q.processAllAvailable()
      val last = spark.table("state_test").filter($"sensorId" === "s1")
        .orderBy(desc("iterations")).as[StreamingJobs.SensorState].head()
      assert(last.iterations == 3L && math.abs(last.tempSum - 17.5) < 1e-9
        && last.lastTs == 300L)
    } finally q.stop()
  }

  test("transformWithState accumulates the same per-sensor state (RocksDB provider)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[SensorReading]
      val q = StreamingJobs.startMemory(
        StreamingJobs.sensorRunningStateTws(in.toDS()).toDF(),
        "tws_test", OutputMode.Update())
      try {
        in.addData(SensorReading("s1", 100L, 10.0f), SensorReading("s1", 200L, 5.0f))
        q.processAllAvailable()
        in.addData(SensorReading("s1", 300L, 2.5f), SensorReading("s2", 50L, 1.0f))
        q.processAllAvailable()
        val rows = spark.table("tws_test").as[StreamingJobs.SensorState].collect()
        val s1 = rows.filter(_.sensorId == "s1").maxBy(_.iterations)
        assert(s1.iterations == 3L && math.abs(s1.tempSum - 17.5) < 1e-9
          && s1.lastTs == 300L)
        assert(rows.exists(s => s.sensorId == "s2" && s.iterations == 1L))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("T1: state survives stop + restart from the checkpoint") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val totals = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def start() = StreamingJobs.wordCount(in.toDF())
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => totals.put(r.getString(0), r.getLong(1)))
      }.start()

    val q1 = start()
    in.addData("alpha beta alpha")
    q1.processAllAvailable()
    q1.stop()

    in.addData("alpha")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(totals.get("alpha") == 3L) // 2 before restart + 1 after: state recovered
      assert(totals.get("beta") == 1L)
    } finally q2.stop()
  }

  test("E2E exactly-once: transformWithState recovery replays into the epoch-idempotent sink without loss or duplication") {
    import graft.io.{FakeStagingDb, Sinks}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    FakeStagingDb.reset()
    val epochRuns = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    try {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[SensorReading]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-ckpt").toString
      val sink = new Sinks.JdbcEpochIdempotent(() => FakeStagingDb.connect(), "e2e")
      def start() = StreamingJobs.sensorRunningStateTws(in.toDS()).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
          epochRuns.merge(epochId, 1, (a, b) => a + b)
          sink.sinkPartitioned(
            "staging",
            "INSERT INTO staging (query_id, epoch_id, part_id, v) VALUES (?, ?, ?, ?)",
            (ps, r) => ps.setString(4,
              s"${r.getString(0)}:${r.getLong(3)}:${r.getDouble(2)}"),
            "INSERT INTO target (v) SELECT v FROM staging " +
              "WHERE query_id = ? AND epoch_id = ?")(batch, epochId)
        }.start()

      val q1 = start()
      in.addData(SensorReading("s1", 100L, 10.0f), SensorReading("s1", 200L, 5.0f))
      q1.processAllAvailable() // epoch 0: s1 → iter 2, sum 15.0
      in.addData(SensorReading("s1", 300L, 2.5f), SensorReading("s2", 50L, 1.0f))
      q1.processAllAvailable() // epoch 1: s1 → iter 3/17.5; s2 → 1/1.0
      q1.stop()

      // simulate a crash after epoch 1's side effects but BEFORE the
      // engine recorded its commit: delete the commit marker, so restart
      // genuinely re-executes epoch 1 (same offsets, recovered state v1)
      assert(java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(ckpt, "commits", "1")))
      java.nio.file.Files.deleteIfExists( // local-FS checksum sidecar
        java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))

      val q2 = start()
      try {
        q2.processAllAvailable() // replays epoch 1 → sink must skip it
        in.addData(SensorReading("s1", 400L, 0.5f))
        q2.processAllAvailable() // epoch 2: s1 → iter 4, sum 18.0
      } finally q2.stop()

      // the replay actually happened (epoch 1 ran twice) ...
      assert(epochRuns.get(1L) == 2, epochRuns.toString)
      // ... and the chain stayed exactly-once end-to-end: state was
      // neither lost (iter keeps counting 2→3→4) nor double-applied,
      // and no epoch's rows were promoted twice
      assert(FakeStagingDb.target.sorted ==
        Seq("s1:2:15.0", "s1:3:17.5", "s1:4:18.0", "s2:1:1.0"))
      assert(FakeStagingDb.epochs == Set(("e2e", 0L), ("e2e", 1L), ("e2e", 2L)))
      assert(FakeStagingDb.staging.isEmpty) // replay left no residue
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming exact dedup drops repeats across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamingJobs.startMemory(
      StreamingJobs.streamingExactDedup(in.toDF().toDF("ts", "text"),
        "ts", Seq("text")),
      "dedup_test", OutputMode.Append())
    def t(s: String) = Timestamp.valueOf(s)
    try {
      in.addData((t("2024-01-01 10:00:00"), "doc a"), (t("2024-01-01 10:00:01"), "doc b"))
      q.processAllAvailable()
      in.addData((t("2024-01-01 10:05:00"), "doc a"), // dup, later batch
        (t("2024-01-01 10:05:01"), "doc c"))
      q.processAllAvailable()
      val texts = spark.table("dedup_test").select("text").as[String]
        .collect().sorted.toSeq
      assert(texts == Seq("doc a", "doc b", "doc c"))
    } finally q.stop()
  }

  test("streaming dedup state is evicted once the watermark passes (bounded state)") {
    // Pins the dropDuplicatesWithinWatermark semantics: a duplicate arriving
    // AFTER the watermark has passed first-occurrence + delay is re-emitted
    // (its state row was evicted) — the price of bounded state on an
    // unbounded stream, and the documented contract of streamingExactDedup.
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamingJobs.startMemory(
      StreamingJobs.streamingExactDedup(in.toDF().toDF("ts", "text"),
        "ts", Seq("text"), lateness = "1 hour"),
      "dedup_evict_test", OutputMode.Append())
    def t(s: String) = Timestamp.valueOf(s)
    try {
      in.addData((t("2024-01-01 10:00:00"), "doc x"))
      q.processAllAvailable()                       // watermark → 09:00
      in.addData((t("2024-01-01 13:00:00"), "advance"))
      q.processAllAvailable()                       // watermark → 12:00 > 10:00+1h: evict
      in.addData((t("2024-01-01 13:30:00"), "doc x")) // state gone → re-emitted
      q.processAllAvailable()
      val n = spark.table("dedup_evict_test")
        .filter(org.apache.spark.sql.functions.col("text") === "doc x").count()
      assert(n == 2, s"expected re-emission after state eviction, got $n")
    } finally q.stop()
  }

  test("streaming fingerprint dedup ignores whitespace/punctuation variants") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamingJobs.startMemory(
      StreamingJobs.streamingFingerprintDedup(in.toDF().toDF("ts", "text"), "ts"),
      "fpdedup_test", OutputMode.Append())
    def t(s: String) = Timestamp.valueOf(s)
    try {
      in.addData((t("2024-01-01 10:00:00"), "The quick fox!"),
        (t("2024-01-01 10:00:01"), "the   QUICK fox"), // same tokens
        (t("2024-01-01 10:00:02"), "fox quick the"))   // order differs → kept
      q.processAllAvailable()
      assert(spark.table("fpdedup_test").count() == 2)
    } finally q.stop()
  }

  test("streaming curation filters quality, dedups, and emits windowed lang stats") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val q = StreamingJobs.startMemory(
      StreamingJobs.streamingCurate(in.toDF().toDF("ts", "lang", "text")),
      "curate_test", OutputMode.Append())
    def t(s: String) = Timestamp.valueOf(s)
    val good1 = "the quick brown fox jumps over the lazy dog near the river bank"
    val good2 = "a calm morning walk through the old town is always a pleasure"
    try {
      in.addData(
        (t("2024-01-01 10:05:00"), "en", good1),
        (t("2024-01-01 10:10:00"), "en", "The  quick brown fox; jumps over the lazy dog near the river bank"), // same tokens → dup
        (t("2024-01-01 10:20:00"), "en", good2),
        (t("2024-01-01 10:25:00"), "de", "!!! ??? ***")) // junk → filtered
      q.processAllAvailable()
      in.addData((t("2024-01-01 12:30:00"), "en", // advances watermark past 11:00
        "another well formed sentence with plenty of ordinary words in it for the advance"))
      q.processAllAvailable()
      val rows = spark.table("curate_test")
        .select("lang", "n_docs").as[(String, Long)].collect().toSet
      assert(rows == Set(("en", 2L))) // dup dropped, junk filtered, window closed
    } finally q.stop()
  }

  test("stream-static join enriches against a broadcast dimension table") {
    implicit val sc = spark.sqlContext
    val dim = Seq(("s1", "hall"), ("s2", "roof")).toDF("sensor", "location")
    val in = MemoryStream[(String, Double)]
    val q = StreamingJobs.startMemory(
      StreamingJobs.enrichWithDim(in.toDF().toDF("sensor", "temp"), dim, "sensor"),
      "dim_join_test", OutputMode.Append())
    try {
      in.addData(("s1", 20.0), ("s2", 21.0), ("s9", 5.0)) // s9: no dim row
      q.processAllAvailable()
      val rows = spark.table("dim_join_test")
        .select("sensor", "location").as[(String, Option[String])]
        .collect().toSet
      assert(rows == Set(("s1", Some("hall")), ("s2", Some("roof")), ("s9", None)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains all available input and stops on its own") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    in.addData("alpha beta", "beta")
    val tmp = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    val q = StreamingJobs.wordCount(in.toDF())
      .writeStream.outputMode("update")
      .option("checkpointLocation", tmp)
      .format("memory").queryName("avnow_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000) // backfill semantics: terminates by itself
    assert(!q.isActive)
    val totals = spark.table("avnow_test").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (w, rs) => w -> rs.map(_._2).max }
    assert(totals("beta") == 2L && totals("alpha") == 1L)
  }

  test("streaming sessionization closes gap-separated sessions (append mode)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s)
    val q = StreamingJobs.startMemory(
      StreamingJobs.sessionize(in.toDF().toDF("user_id", "ts")),
      "sess_test", OutputMode.Append())
    try {
      in.addData((7L, t("2024-01-01 10:00:00")), (7L, t("2024-01-01 10:10:00")),
        (7L, t("2024-01-01 11:30:00"))) // > 30 min gap → second session
      q.processAllAvailable()
      in.addData((7L, t("2024-01-01 14:00:00"))) // watermark closes both
      q.processAllAvailable()
      val rows = spark.table("sess_test")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSet
      assert(rows == Set((7L, 2L), (7L, 1L)))
    } finally q.stop()
  }

  test("stream-stream join attributes clicks within the time window") {
    implicit val sc = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s)
    val q = StreamingJobs.startMemory(
      StreamingJobs.clickAttribution(
        imps.toDF().toDF("imp_id", "imp_ts"),
        clicks.toDF().toDF("click_imp_id", "click_ts")),
      "attr_test", OutputMode.Append())
    try {
      imps.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, t("2024-01-01 10:30:00")),  // within 1h → attributed
        (2L, t("2024-01-01 12:00:00")))  // 2h later → outside window
      q.processAllAvailable()
      val got = spark.table("attr_test").select("imp_id").as[Long].collect().toSeq
      assert(got == Seq(1L))
    } finally q.stop()
  }

  test("the same logical pipeline runs bounded (T5 unified batch/stream)") {
    val batchLines = Seq("NYSE,ABB,2010-01-04,19.05,19.19,18.90,19.12,1720000,17.84")
      .toDF("value")
    val out = StreamingJobs.minMaxBySymbolYear(batchLines)
      .as[(String, Int, Float, Float)].collect()
    assert(out.toSeq == Seq(("ABB", 2010, 19.19f, 19.19f)))
  }

  test("semantic decontamination runs unchanged on a stream (stateless " +
    "stream-static broadcast anti-join, T5 unified batch/stream)") {
    implicit val sc = spark.sqlContext
    val held = Seq((100L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val in = MemoryStream[(Long, Seq[Float])]
    val q = StreamingJobs.startMemory(
      graft.ext.Similarity.semanticDecontaminate(
        in.toDF().toDF("vec_id", "embedding"), held, threshold = 0.8),
      "sdecon_test", OutputMode.Append())
    try {
      in.addData((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(0.8f, 0.6f)))
      q.processAllAvailable()
      val kept = spark.table("sdecon_test").select("vec_id").as[Long]
        .collect().toSet
      assert(kept == Set(2L)) // same survivors as the batch twin in ExtSpec
    } finally q.stop()
  }

  test("bloom decontamination runs unchanged on a stream (literal bitset " +
    "probe + stateless stream-static anti-join, T5 unified batch/stream)") {
    implicit val sc = spark.sqlContext
    val held = Seq((100L, "drop me"), (101L, "also drop"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val q = StreamingJobs.startMemory(
      graft.ext.Curation.bloomDecontaminate(
        in.toDF().toDF("doc_id", "text"), held, expectedItems = 10L),
      "bloom_test", OutputMode.Append())
    try {
      in.addData((1L, "keep me"), (2L, "drop me"), (3L, "also keep"))
      q.processAllAvailable()
      val kept = spark.table("bloom_test").select("doc_id").as[Long]
        .collect().toSet
      assert(kept == Set(1L, 3L)) // same survivors as the batch form
    } finally q.stop()
  }

  test("decontamination against the PERSISTED bloom index runs unchanged " +
    "on a stream (the weekly-crawl steady state: stored bitset probe + " +
    "stateless anti-join vs the stored digest table)") {
    implicit val sc = spark.sqlContext
    val held = Seq((100L, "drop me"), (101L, "also drop"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_bloom_stream")
    try {
      graft.ext.Curation.buildBloomIndex(held, s"$idx/h", expectedItems = 10L)
      val in = MemoryStream[(Long, String)]
      val q = StreamingJobs.startMemory(
        graft.ext.Curation.bloomDecontaminateFromIndex(
          in.toDF().toDF("doc_id", "text"), s"$idx/h"),
        "bloom_idx_test", OutputMode.Append())
      try {
        in.addData((1L, "keep me"), (2L, "drop me"), (3L, "also keep"))
        q.processAllAvailable()
        val kept = spark.table("bloom_idx_test").select("doc_id").as[Long]
          .collect().toSet
        assert(kept == Set(1L, 3L)) // same survivors as the batch form
      } finally q.stop()
    } finally {
      graft.io.Fs.deleteRecursively(idx)
    }
  }

  test("dsir scoring runs unchanged on a stream (λ-table baked into the " +
    "stateless projection, T5 unified batch/stream)") {
    implicit val sc = spark.sqlContext
    import graft.ext.Dsir
    val target = Seq((0L, "curated clean prose here"),
      (10L, "more curated clean text")).toDF("doc_id", "text")
    val raw = Seq((1L, "curated clean prose here"),
      (2L, "zzz spam junk noise")).toDF("doc_id", "text")
    val m = Dsir.fit(target, raw, buckets = 256)
    val batchScores = Dsir.score(raw, m).select("doc_id", "dsir_score")
      .as[(Long, Long)].collect().toMap
    val in = MemoryStream[(Long, String)]
    val q = StreamingJobs.startMemory(
      Dsir.score(in.toDF().toDF("doc_id", "text"), m)
        .select("doc_id", "dsir_score"),
      "dsir_test", OutputMode.Append())
    try {
      in.addData((1L, "curated clean prose here"), (2L, "zzz spam junk noise"))
      q.processAllAvailable()
      val streamed = spark.table("dsir_test").select("doc_id", "dsir_score")
        .as[(Long, Long)].collect().toMap
      assert(streamed == batchScores) // bit-identical to the batch form
    } finally q.stop()
  }

  test("streaming incremental dedup: batches probe the persisted index, " +
    "flag dups, and append survivors so later batches dedup against " +
    "earlier ones") {
    implicit val sc = spark.sqlContext
    import graft.ext.Dedup
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "an utterly unrelated document about spark engines today"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_sdedup_idx")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdedup_ckpt")
    try {
      Dedup.buildDedupIndex(base, idx.toString, numHashes = 128, bands = 32)
      val in = MemoryStream[(Long, String)]
      val flagged = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q = StreamingJobs.streamingIncrementalDedup(
        in.toDF().toDF("doc_id", "text"), idx.toString, threshold = 0.5,
        onDupPairs = (pairs, epoch) =>
          pairs.collect().foreach(r =>
            flagged += ((epoch, r.getLong(0), r.getLong(1)))))
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        in.addData(
          (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
          (11L, "completely novel text about streaming incremental dedup pipelines"))
        q.processAllAvailable()
        // 10 flagged against the BASE corpus; 11 survives and is appended
        assert(flagged.map(p => (p._2, p._3)).toSet == Set((0L, 10L)))

        in.addData(
          (20L, "completely novel text about streaming incremental dedup pipelines"), // dup of APPENDED 11
          (21L, "another genuinely fresh document mentioning nothing seen before"))
        q.processAllAvailable()
        // 20 can only be flagged if batch 1's survivor reached the index
        assert(flagged.map(p => (p._2, p._3)).toSet ==
          Set((0L, 10L), (11L, 20L)))
        // dropped docs must NOT poison the index: 10 was a dup, so a
        // later dup of 10 pairs only with 0 (asserted above — no (10, 20))
      } finally q.stop()
    } finally {
      Seq(idx, ckpt).foreach(d =>
        graft.io.Fs.deleteRecursively(d))
    }
  }

  test("takedown lands mid-stream: ids deleted from the index are " +
    "invisible to the NEXT micro-batch's probe without a restart") {
    implicit val sc = spark.sqlContext
    import graft.ext.Dedup
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "an utterly unrelated document about spark engines today"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_sdel_idx")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdel_ckpt")
    try {
      Dedup.buildDedupIndex(base, idx.toString, numHashes = 128, bands = 32)
      val in = MemoryStream[(Long, String)]
      val flagged = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = StreamingJobs.streamingIncrementalDedup(
        in.toDF().toDF("doc_id", "text"), idx.toString, threshold = 0.5,
        onDupPairs = (pairs, _) =>
          pairs.collect().foreach(r =>
            flagged += ((r.getLong(0), r.getLong(1)))))
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        in.addData(
          (10L, "the quick brown fox jumps over the lazy dog tonight")) // dup of 0
        q.processAllAvailable()
        assert(flagged.toSet == Set((0L, 10L)))

        // takedown of 0 WHILE the stream runs — tombstones are read at
        // each batch's probe plan, so no restart is needed
        import spark.implicits._
        Dedup.deleteFromDedupIndex(Seq(0L).toDF("doc_id"), idx.toString)
        in.addData(
          (20L, "the quick brown fox jumps over the lazy dog tonight")) // dup of REMOVED 0
        q.processAllAvailable()
        // 20 must NOT pair with the tombstoned 0 — it pairs with 10's
        // appended copy instead (10 survived batch 0? no — 10 was a dup
        // and dropped, so 20 pairs with nothing and becomes a survivor)
        assert(flagged.toSet == Set((0L, 10L)), flagged.toString)
        val bandIds = spark.read.parquet(
          graft.io.Tables.resolveComponent(spark, s"$idx/bands"))
          .select("id").distinct().as[Long].collect().toSet
        assert(bandIds.contains(20L), "20 should survive and be appended")
      } finally q.stop()
    } finally {
      Seq(idx, ckpt).foreach(d =>
        graft.io.Fs.deleteRecursively(d))
    }
  }

  test("E2E exactly-once: streaming incremental dedup crash replay " +
    "neither double-appends the index nor re-emits committed pairs") {
    implicit val sc = spark.sqlContext
    import graft.ext.Dedup
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "an utterly unrelated document about spark engines today"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_sdedup2_idx")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdedup2_ckpt")
    try {
      Dedup.buildDedupIndex(base, idx.toString, numHashes = 128, bands = 32)
      val in = MemoryStream[(Long, String)]
      val flagged = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      def start() = StreamingJobs.streamingIncrementalDedup(
        in.toDF().toDF("doc_id", "text"), idx.toString, threshold = 0.5,
        onDupPairs = (pairs, epoch) =>
          pairs.collect().foreach(r =>
            flagged += ((epoch, r.getLong(0), r.getLong(1)))))
        .option("checkpointLocation", ckpt.toString)
        .start()

      val q1 = start()
      in.addData(
        (10L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
        (11L, "completely novel text about streaming incremental dedup pipelines"))
      q1.processAllAvailable() // epoch 0: flag 10, append 11
      in.addData(
        (21L, "another genuinely fresh document mentioning nothing seen before"))
      q1.processAllAvailable() // epoch 1: append 21
      q1.stop()

      // crash AFTER epoch 1's side effects but BEFORE the engine's
      // commit: delete the commit marker so restart re-executes epoch 1
      // with the same offsets — the epoch-idempotent append must detect
      // its own marker and skip wholesale
      assert(java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(ckpt.toString, "commits", "1")))
      java.nio.file.Files.deleteIfExists( // local-FS checksum sidecar
        java.nio.file.Paths.get(ckpt.toString, "commits", ".1.crc"))

      val q2 = start()
      try {
        q2.processAllAvailable() // replays epoch 1 → must be a no-op
        in.addData(
          (30L, "another genuinely fresh document mentioning nothing seen before")) // dup of 21
        q2.processAllAvailable() // epoch 2: flags (21, 30)
      } finally q2.stop()

      // pairs exactly-once: epoch 1 emitted nothing on replay, and the
      // new batch's dup is attributed to the ONE copy of 21 in the index
      assert(flagged.map(p => (p._2, p._3)).toSet ==
        Set((0L, 10L), (21L, 30L)), flagged.toString)
      // index exactly-once: every survivor carries exactly `bands` = 32
      // band rows — a double-appended epoch would show 64 for 21
      val bandRows = spark.read.parquet(s"$idx/bands")
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      assert(bandRows.keySet == Set(0L, 1L, 11L, 21L), bandRows.toString)
      assert(bandRows.values.forall(_ == 32L), bandRows.toString)
      // the epoch markers record the committed appends
      assert(Dedup.epochCommitted(spark, idx.toString, "sdedup", 0L))
      assert(Dedup.epochCommitted(spark, idx.toString, "sdedup", 1L))
      // staging left no residue
      val stagingDir = java.nio.file.Paths.get(s"$idx/_staging")
      assert(!java.nio.file.Files.exists(stagingDir) ||
        scala.util.Using.resource(java.nio.file.Files.list(stagingDir))(
          st => !st.findAny().isPresent))
    } finally {
      Seq(idx, ckpt).foreach(d =>
        graft.io.Fs.deleteRecursively(d))
    }
  }
}
