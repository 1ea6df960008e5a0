package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.jobs.StreamingEmbedIndexJob

/** Exactly-once streaming growth of the persisted IVF index
  * (Similarity.appendToIvfIndexEpoch over io.EpochCommit) and its
  * interplay with compaction — the ANN twins of the dedup-index epoch
  * suite. Axis-aligned unit vectors make cosine structure exact: a copy
  * has cosine 1, everything else 0. */
class AnnEpochSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def axis(i: Int): Seq[Float] =
    Seq.tabulate(dim)(j => if (j == i % dim) 1.0f else 0.0f)

  private def corpus: DataFrame =
    (0 until 8).map(i => (i.toLong, axis(i))).toDF("vec_id", "embedding")

  private def assignedIds(path: String): Map[Long, Long] =
    spark.read.parquet(graft.io.Tables.resolveComponent(
        spark, s"$path/assignments"))
      .groupBy("cand_id").count().as[(Long, Long)].collect().toMap

  test("epoch-idempotent IVF append: replays are no-ops and partial " +
    "promotes converge (the foreachBatch exactly-once contract)") {
    val idx = java.nio.file.Files.createTempDirectory("graft_annepoch")
    try {
      Similarity.buildIvfIndex(corpus, idx.toString,
        numCentroids = 8, kmeansIters = 0, indexFiles = 2)
      val batch = Seq((100L, axis(8)), (101L, axis(9)))
        .toDF("vec_id", "embedding")

      assert(Similarity.appendToIvfIndexEpoch(batch, idx.toString, 5))
      val after1 = assignedIds(idx.toString)
      assert(after1(100L) == 1 && after1(101L) == 1, after1.toString)

      // replay of a COMMITTED epoch: marker detected, index untouched
      assert(!Similarity.appendToIvfIndexEpoch(batch, idx.toString, 5))
      assert(assignedIds(idx.toString) == after1)
      assert(Similarity.annEpochCommitted(spark, idx.toString, "stream", 5L))

      // crash BETWEEN promote and marker: files landed, marker missing —
      // replay must clean the partial promote and converge, not double
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$idx/_epochs/stream-5"))
      assert(Similarity.appendToIvfIndexEpoch(batch, idx.toString, 5))
      assert(assignedIds(idx.toString) == after1,
        "partial-promote replay double-appended")
    } finally graft.io.Fs.deleteRecursively(idx)
  }

  test("compactAnnIndex EXCLUDES an uncommitted epoch's partial files; " +
    "the replay re-appends into the new version and probes converge") {
    val idx = java.nio.file.Files.createTempDirectory("graft_anncompact")
    try {
      Similarity.buildIvfIndex(corpus, idx.toString,
        numCentroids = 8, kmeansIters = 0, indexFiles = 2)
      val batch = Seq((100L, axis(8))).toDF("vec_id", "embedding")
      assert(Similarity.appendToIvfIndexEpoch(batch, idx.toString, 5))
      // simulate the crash window: promote landed, marker lost
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$idx/_epochs/stream-5"))

      // a maintenance compaction racing the downed stream must NOT fold
      // the partial files in under fresh names
      Similarity.compactAnnIndex(spark, idx.toString, indexFiles = 2)
      assert(!assignedIds(idx.toString).contains(100L),
        "compaction folded an uncommitted epoch into the new version")

      // the stream comes back and replays the epoch: lands exactly once
      assert(Similarity.appendToIvfIndexEpoch(batch, idx.toString, 5))
      val after = assignedIds(idx.toString)
      assert(after(100L) == 1, after.toString)
      // the probe path sees the replayed vector through the new version
      val q = Seq((900L, axis(8))).toDF("vec_id", "embedding")
      val top = Similarity.ivfTopKFromIndex(spark, idx.toString, q,
        k = 1, nprobe = 4).collect()
      assert(top.length == 1 && top(0).getLong(1) == 100L, top.mkString(","))
    } finally graft.io.Fs.deleteRecursively(idx)
  }

  test("StreamingEmbedIndexJob watches a directory: each drop probes the " +
    "index, records its epoch's near-dup hits, and appends only novel " +
    "vectors for later drops to probe against") {
    val root = java.nio.file.Files.createTempDirectory("graft_embjob")
    def p(s: String) = s"$root/$s"
    try {
      corpus.write.parquet(p("corpus"))
      Similarity.buildIvfIndex(spark.read.parquet(p("corpus")), p("idx"),
        numCentroids = 8, kmeansIters = 0, indexFiles = 2)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p("watch")))

      def drop(name: String, rows: Seq[(Long, Seq[Float])]): Unit = {
        rows.toDF("vec_id", "embedding").coalesce(1)
          .write.parquet(p(s"stage_$name"))
        scala.util.Using.resource(java.nio.file.Files.list(
          java.nio.file.Paths.get(p(s"stage_$name"))))(
          _.filter(_.toString.endsWith(".parquet"))
            .forEach(f => java.nio.file.Files.move(f,
              java.nio.file.Paths.get(p(s"watch/$name.parquet")))))
      }
      val q = StreamingEmbedIndexJob.start(spark, p("watch"), p("idx"),
        p("out"), p("ckpt"), threshold = 0.95)
      try {
        drop("crawl1", Seq(
          (10L, axis(0)), // near-dup of indexed 0 — hit, not indexed
          (11L, axis(9)))) // novel — appended
        q.processAllAvailable()
        drop("crawl2", Seq(
          (20L, axis(9)))) // near-dup of 11, appended by epoch 0
        q.processAllAvailable()
      } finally q.stop()

      // per-epoch hit record: epoch 0 flagged 10→0; epoch 1 flagged
      // 20→11 — which requires epoch 0's novel append to have landed
      val hits = spark.read
        .parquet(p("out/dup_hits/epoch_0"), p("out/dup_hits/epoch_1"))
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      assert(hits == Set((10L, 0L), (20L, 11L)), hits.toString)
      // index state: novel 11 appended exactly once; dups 10/20 never
      val ids = assignedIds(p("idx"))
      assert(ids.keySet == (0L until 8L).toSet + 11L, ids.toString)
      assert(ids.values.forall(_ == 1L), ids.toString)
    } finally graft.io.Fs.deleteRecursively(root)
  }

  test("StreamingEmbedIndexJob kill/recovery: a crash AFTER the index " +
    "append but BEFORE the checkpoint commit replays the epoch without " +
    "double-appending; index and hit record identical to a clean run") {
    import graft.ops.Caching
    val root = java.nio.file.Files.createTempDirectory("graft_embkill")
    def p(s: String) = s"$root/$s"
    val crawl2 = Seq((20L, axis(10)), (21L, axis(9))) // 21 dups epoch-0's 10
    try {
      corpus.write.parquet(p("corpus"))
      Similarity.buildIvfIndex(spark.read.parquet(p("corpus")), p("idx"),
        numCentroids = 8, kmeansIters = 0, indexFiles = 2)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p("watch")))
      def drop(name: String, rows: Seq[(Long, Seq[Float])]): Unit = {
        rows.toDF("vec_id", "embedding").coalesce(1)
          .write.parquet(p(s"stage_$name"))
        scala.util.Using.resource(java.nio.file.Files.list(
          java.nio.file.Paths.get(p(s"stage_$name"))))(
          _.filter(_.toString.endsWith(".parquet"))
            .forEach(f => java.nio.file.Files.move(f,
              java.nio.file.Paths.get(p(s"watch/$name.parquet")))))
      }
      def runStream(): Unit = {
        val q = graft.jobs.StreamingEmbedIndexJob.start(spark, p("watch"),
          p("idx"), p("out"), p("ckpt"), threshold = 0.95)
        try q.processAllAvailable() finally q.stop()
      }

      // epoch 0 commits cleanly: novel vector 10 lands
      drop("crawl1", Seq((10L, axis(9))))
      runStream()
      assert(Similarity.annEpochCommitted(spark, p("idx"), "embcrawl", 0L))

      // THE CRASH: epoch 1's foreachBatch ran to completion — hits
      // recorded, index append marker-committed — but the engine died
      // before the checkpoint commit log, so the restart replays the
      // batch. Emulate by performing the exact body the job runs (same
      // queryId, same epoch id the restart will assign) without letting
      // the streaming checkpoint see it.
      Caching.scoped {
        val batch = crawl2.toDF("vec_id", "embedding")
        val hits = Caching.register(
          Similarity.ivfTopKFromIndex(spark, p("idx"), batch, k = 1,
              nprobe = 4)
            .filter(col("score") >= 0.95))
        hits.write.mode("overwrite").parquet(p("out/dup_hits/epoch_1"))
        val novel = batch.join(
          hits.select(col("query_id").as("vec_id")), Seq("vec_id"),
          "left_anti")
        assert(Similarity.appendToIvfIndexEpoch(novel, p("idx"), 1L,
          "embcrawl"), "crashed attempt must have performed the append")
      }

      // restart from the SAME checkpoint with crawl2 now visible: the
      // engine replays it as epoch 1; the committed marker must make the
      // whole batch a no-op
      drop("crawl2", crawl2)
      runStream()

      val ids = assignedIds(p("idx"))
      assert(ids.keySet == (0L until 8L).toSet ++ Set(10L, 20L),
        ids.toString)
      assert(ids.values.forall(_ == 1L),
        s"replay double-appended: $ids")
      val hits = spark.read
        .parquet(p("out/dup_hits/epoch_0"), p("out/dup_hits/epoch_1"))
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      assert(hits == Set((21L, 10L)), hits.toString)
    } finally graft.io.Fs.deleteRecursively(root)
  }

  test("maxFilesPerTrigger drains a backlog as several bounded epochs, " +
    "each with its own exactly-once marker") {
    val root = java.nio.file.Files.createTempDirectory("graft_embbacklog")
    def p(s: String) = s"$root/$s"
    try {
      corpus.write.parquet(p("corpus"))
      Similarity.buildIvfIndex(spark.read.parquet(p("corpus")), p("idx"),
        numCentroids = 8, kmeansIters = 0, indexFiles = 2)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p("watch")))
      // a 3-file backlog lands BEFORE the stream starts (restart against
      // a week of accumulated crawls)
      (0 until 3).foreach { i =>
        Seq((100L + i, axis(9 + i))).toDF("vec_id", "embedding").coalesce(1)
          .write.parquet(p(s"stage_$i"))
        scala.util.Using.resource(java.nio.file.Files.list(
          java.nio.file.Paths.get(p(s"stage_$i"))))(
          _.filter(_.toString.endsWith(".parquet"))
            .forEach(f => java.nio.file.Files.move(f,
              java.nio.file.Paths.get(p(s"watch/b$i.parquet")))))
      }
      val q = graft.jobs.StreamingEmbedIndexJob.start(spark, p("watch"),
        p("idx"), p("out"), p("ckpt"), threshold = 0.95,
        maxFilesPerTrigger = 1)
      try q.processAllAvailable() finally q.stop()
      // one epoch marker per file, not one giant batch
      val markers = new java.io.File(p("idx/_epochs")).list().toSet
        .filterNot(_.startsWith(".")) // local-FS .crc sidecars
      assert(markers == Set("embcrawl-0", "embcrawl-1", "embcrawl-2"),
        markers.toString)
      val ids = assignedIds(p("idx"))
      assert(ids.keySet == (0L until 8L).toSet ++ Set(100L, 101L, 102L),
        ids.toString)
    } finally graft.io.Fs.deleteRecursively(root)
  }
}
