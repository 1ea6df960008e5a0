package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Bloom file-skipping index (BloomSkip): membership pruning for
  * equality/IN lookups on columns whose per-file [min,max] ranges all
  * overlap — the case range stats can NEVER prune. Invariants: pruning
  * is SOUND (results always equal the unpruned filter — unindexed
  * files, unsupported shapes and OR trees read conservatively) and
  * EFFECTIVE (a point lookup on the indexed scattered column cuts the
  * file list, pinned via entry counts and the connector's numFiles
  * metric), the index survives rename (physical-name keyed) and type
  * widening (long-normalized hashing), build is incremental, and
  * maintain refreshes it. */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bsk").toString + "/t"

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  // tag is a bit-reversed id: unique per row, and every file's tag
  // range spans ~the full domain — range stats keep all 10 files for
  // any tag probe, so only the bloom can prune
  private def scatter(i: Int): Long =
    java.lang.Long.reverse(i.toLong) >>> 32

  private def df: DataFrame =
    (0 until 1000).map(i => (i.toLong, scatter(i), s"u${scatter(i)}"))
      .toDF("id", "tag", "utag")

  private def make(path: String): Unit =
    ManifestTable.create(df, path, "id", numFiles = 10,
      statsCols = Seq("tag"))

  private def keptFor(path: String, cond: org.apache.spark.sql.Column)
      : Seq[String] = {
    val m = ManifestTable.readManifest(spark, path)
    BloomSkip.pruneCond(spark, path, m, cond,
      ManifestTable.entriesWhere(spark, m, cond)).map(_.relPath)
  }

  test("point lookup on a scattered column: ranges keep all files, the " +
    "bloom cuts to ~1; results equal the unpruned filter") {
    val path = tmp()
    try {
      make(path)
      val v = scatter(421)
      // range stats are powerless here (every file covers the domain)
      assert(ManifestTable.entriesWhere(spark,
        ManifestTable.readManifest(spark, path), col("tag") === v).size == 10)
      assert(keptFor(path, col("tag") === v).size == 10) // no index yet
      assert(BloomSkip.build(spark, path, "tag") == 10)
      assert(BloomSkip.build(spark, path, "tag") == 0) // steady state
      val kept = keptFor(path, col("tag") === v)
      assert(kept.size <= 3, s"expected <=3 files after bloom, got $kept")
      val got = ManifestTable.readWhere(spark, path, col("tag") === v)
      assert(got.count() == 1L && got.select("id").as[Long].head() == 421L)
      // IN over two scattered values
      val vs = Seq(scatter(7), scatter(901))
      val keptIn = keptFor(path, col("tag").isin(vs: _*))
      assert(keptIn.size <= 4)
      assert(ManifestTable.readWhere(spark, path,
        col("tag").isin(vs: _*)).count() == 2L)
    } finally cleanup(path)
  }

  test("string column indexes and prunes; OR trees and inequalities " +
    "never consult the bloom") {
    val path = tmp()
    try {
      make(path)
      BloomSkip.build(spark, path, "utag")
      val v = s"u${scatter(88)}"
      val kept = keptFor(path, col("utag") === v)
      assert(kept.size <= 3, s"got $kept")
      assert(ManifestTable.readWhere(spark, path, col("utag") === v)
        .select("id").as[Long].head() == 88L)
      // OR: either side alone could miss rows — conservative
      assert(keptFor(path,
        col("utag") === v || col("tag") === scatter(3)).size == 10)
      // inequality on the indexed column: not a membership probe
      assert(keptFor(path, col("tag") > 0L).size == 10)
    } finally cleanup(path)
  }

  test("incremental: a merged batch's new files stay conservative until " +
    "the next build (or maintain) indexes them") {
    val path = tmp()
    try {
      make(path)
      BloomSkip.build(spark, path, "tag")
      ManifestTable.merge(spark, path,
        Seq((5000L, scatter(5000).toLong, "x")).toDF("id", "tag", "utag"))
      val v = scatter(5000)
      // the appended file has no index row: it must survive the probe
      val got = ManifestTable.readWhere(spark, path, col("tag") === v)
      assert(got.count() == 1L)
      val r = ManifestTable.maintain(spark, path)
      assert(r.bloomIndexed.getOrElse("tag", 0) >= 1)
      assert(ManifestTable.readWhere(spark, path, col("tag") === v)
        .count() == 1L)
    } finally cleanup(path)
  }

  test("rename keeps the index (physical name); widening keeps probes " +
    "exact (long-normalized hashes)") {
    val path = tmp()
    try {
      val narrow = (0 until 1000)
        .map(i => (i.toLong, (scatter(i) % 100000L).toInt))
        .toDF("id", "tag32")
      ManifestTable.create(narrow, path, "id", numFiles = 10)
      BloomSkip.build(spark, path, "tag32")
      ManifestTable.renameColumn(spark, path, "tag32", "tag64")
      ManifestTable.widenColumn(spark, path, "tag64",
        org.apache.spark.sql.types.LongType)
      val v = (scatter(77) % 100000L)
      val kept = keptFor(path, col("tag64") === v)
      assert(kept.size < 10, s"bloom did not prune after rename+widen: $kept")
      val got = ManifestTable.readWhere(spark, path, col("tag64") === v)
      assert(got.count() ==
        (0 until 1000).count(i => scatter(i) % 100000L == v).toLong)
    } finally cleanup(path)
  }

  test("deleteWhere and updateWhere route their match reads through the " +
    "bloom; dv'd files keep sound supersets") {
    val path = tmp()
    try {
      make(path)
      BloomSkip.build(spark, path, "tag")
      val v1 = scatter(100)
      val st = ManifestTable.deleteWhere(spark, path, col("tag") === v1)
      assert(st.deadMarked == 1L)
      assert(ManifestTable.read(spark, path).count() == 999L)
      // the dv shrank file 100's live set; its bloom (superset) stays
      // sound for other probes
      val v2 = scatter(101)
      ManifestTable.updateWhere(spark, path, col("tag") === v2,
        Map("utag" -> lit("UPDATED")))
      val got = ManifestTable.readWhere(spark, path, col("tag") === v2)
      assert(got.select("utag").as[String].head() == "UPDATED")
      // probing the deleted value returns nothing, still correct
      assert(ManifestTable.readWhere(spark, path, col("tag") === v1)
        .count() == 0L)
    } finally cleanup(path)
  }

  test("the connector's FileIndex consults the bloom: numFiles metric " +
    "drops for an indexed point lookup") {
    val path = tmp()
    try {
      make(path)
      BloomSkip.build(spark, path, "tag")
      val v = scatter(300)
      val q = spark.read.format("graft").load(path).filter(col("tag") === v)
      q.collect()
      val scan = q.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      assert(scan.metrics("numFiles").value <= 3,
        s"connector scanned ${scan.metrics("numFiles").value} files")
      assert(q.count() == 1L)
    } finally cleanup(path)
  }

  test("index GC: once compaction retires most indexed files the next " +
    "build folds the index to the live set; dropped columns reclaim") {
    val path = tmp()
    try {
      make(path)
      BloomSkip.build(spark, path, "tag")
      // full rewrite retires all 10 indexed files -> 100% stale rows
      ManifestTable.compactTable(spark, path, numFiles = 4)
      assert(BloomSkip.build(spark, path, "tag") == 4)
      val idx = spark.read.parquet(s"$path/_bloomidx/tag")
      val liveRels = ManifestTable.readManifest(spark, path)
        .entries.map(_.relPath).toSet
      val rows = idx.select("__f").as[String].collect()
      assert(rows.toSet.subsetOf(liveRels), s"stale rows survived GC: " +
        s"${rows.toSet -- liveRels}")
      // probes still prune and stay exact after the fold
      val v = scatter(421)
      assert(keptFor(path, col("tag") === v).size <= 2)
      assert(ManifestTable.readWhere(spark, path, col("tag") === v)
        .count() == 1L)
      // a dropped column's index is reclaimed by the next refresh
      BloomSkip.build(spark, path, "utag")
      ManifestTable.dropColumn(spark, path, "utag")
      ManifestTable.maintain(spark, path)
      val f = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      assert(!f.exists(new org.apache.hadoop.fs.Path(
        s"$path/_bloomidx/utag")))
      assert(f.exists(new org.apache.hadoop.fs.Path(s"$path/_bloomidx/tag")))
    } finally cleanup(path)
  }

  test("steady-state probes are DRIVER-LOCAL: with the index cached, a " +
    "pruning decision launches ZERO Spark jobs") {
    val path = tmp()
    try {
      make(path)
      BloomSkip.build(spark, path, "tag")
      val m = ManifestTable.readManifest(spark, path)
      // warm the driver cache (first probe loads the sidecars via
      // parquet-hadoop on the driver — still zero Spark jobs, but the
      // census here pins the steady state explicitly)
      keptFor(path, col("tag") === scatter(1))
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        (0 until 5).foreach { i =>
          val kept = BloomSkip.pruneCond(spark, path, m,
            col("tag") === scatter(100 + i), m.entries)
          assert(kept.size <= 3)
        }
        // listenerBus is private[spark]; events of completed synchronous
        // work drain within a beat (the ConstraintSpec census pattern)
        Thread.sleep(300)
        assert(jobs.get() == 0,
          s"bloom probes launched ${jobs.get()} Spark job(s) — the " +
          "driver cache must answer membership locally")
      } finally spark.sparkContext.removeSparkListener(listener)
      // the cache refreshes when the index changes on disk: dropping
      // the index makes probes conservative again (no stale pruning)
      BloomSkip.drop(spark, path, "tag")
      assert(BloomSkip.pruneCond(spark, path, m,
        col("tag") === scatter(1), m.entries).size == 10)
    } finally cleanup(path)
  }

  test("unsupported column types refuse loudly; drop removes the index") {
    val path = tmp()
    try {
      val d = (0 until 100).map(i => (i.toLong, i.toDouble))
        .toDF("id", "score")
      ManifestTable.create(d, path, "id", numFiles = 4)
      intercept[IllegalArgumentException] {
        BloomSkip.build(spark, path, "score")
      }
      ManifestTable.create(df, path, "id", numFiles = 10)
      BloomSkip.build(spark, path, "tag")
      BloomSkip.drop(spark, path, "tag")
      assert(keptFor(path, col("tag") === scatter(5)).size == 10)
    } finally cleanup(path)
  }
}
