package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** maintain — the one-call maintenance pass: each trigger fires only
  * when its policy says so, content is invariant, and a quiet table
  * costs nothing but manifest reads. */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mt").toString + "/t"

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  private def df: DataFrame =
    (0 until 2000).map(i => (i.toLong, i * 3L)).toDF("id", "v")

  test("a quiet table fires nothing but the vacuum") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 4)
      val r = ManifestTable.maintain(spark, path)
      assert(r == ManifestTable.MaintenanceReport(false, false, false,
        false, true))
      assert(ManifestTable.readManifest(spark, path).version == 1L)
    } finally cleanup(path)
  }

  test("dead-ratio breach materializes vectors; content invariant") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 4)
      ManifestTable.deleteKeysDV(spark, path,
        df.filter(col("id") % 2 === 0).select("id")) // 50% dead
      val r = ManifestTable.maintain(spark, path)
      assert(r.materializedDeadRatio && !r.consolidatedSidecars)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.entries.forall(_.dv.isEmpty), "vectors materialized out")
      assert(ManifestTable.read(spark, path).agg(sum("v"))
        .first().getLong(0) ==
        df.filter(col("id") % 2 === 1).agg(sum("v")).first().getLong(0))
    } finally cleanup(path)
  }

  test("below the dead ratio, fragmented sidecars consolidate instead") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 4)
      // touch DIFFERENT files so each commit leaves its own sidecar
      // (same-file re-deletes consolidate at commit time via carryOld)
      ManifestTable.deleteKeysDV(spark, path, Seq(1L, 2L).toDF("id"))
      ManifestTable.deleteKeysDV(spark, path, Seq(1501L, 1502L).toDF("id"))
      val r = ManifestTable.maintain(spark, path)
      assert(!r.materializedDeadRatio && r.consolidatedSidecars)
      assert(ManifestTable.read(spark, path).count() == 1996L)
    } finally cleanup(path)
  }

  test("partitioned table: maintain folds ONLY the fragmented partition " +
    "— healthy partitions carried byte-identical, purity preserved") {
    val path = tmp()
    try {
      val base = (0 until 300).map(i => (i.toLong, s"p${i % 3}", i * 2L))
        .toDF("id", "pt", "v")
      ManifestTable.createPartitioned(base, path, "id", "pt")
      // fragment p1 with three tiny NEW-KEY merges (append-only)
      (1 to 3).foreach { i =>
        ManifestTable.merge(spark, path,
          Seq((400L + i, "p1", 1L)).toDF("id", "pt", "v"))
      }
      val before = ManifestTable.readManifest(spark, path)
      def pOf(e: ManifestTable.FileEntry) = e.extra("pt")._1
      assert(before.entries.count(p => pOf(p) == "p1") == 4)
      val othersBefore = before.entries.filterNot(p => pOf(p) == "p1")
        .map(_.relPath).toSet
      val r = ManifestTable.maintain(spark, path, targetRows = 10L,
        maxSmallFiles = 2)
      assert(r.compactedPartitions == Seq("p1"), s"got $r")
      assert(!r.compactedFileCount && !r.smallFilesFolded,
        "flat-table triggers must not fire on a partitioned table")
      val after = ManifestTable.readManifest(spark, path)
      assert(after.entries.count(p => pOf(p) == "p1") == 1,
        "fragmented partition folds to one file")
      assert(after.entries.filterNot(p => pOf(p) == "p1")
        .map(_.relPath).toSet == othersBefore,
        "healthy partitions must be carried by reference")
      after.entries.foreach { e =>
        val (mn, mx) = e.extra("pt"); assert(mn == mx, "purity broken") }
      assert(ManifestTable.read(spark, path).count() == 303L)
      // a second pass is quiet: nothing fragmented anymore
      val r2 = ManifestTable.maintain(spark, path, targetRows = 10L,
        maxSmallFiles = 2)
      assert(r2.compactedPartitions.isEmpty)
    } finally cleanup(path)
  }

  test("small-file fragment mass folds; the big create files survive " +
    "by reference") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 2) // 1000-row files
      (1 to 6).foreach { i =>
        ManifestTable.merge(spark, path,
          Seq((10000L + i, 1L)).toDF("id", "v"))
      }
      val before = ManifestTable.readManifest(spark, path)
      assert(before.entries.count(_.rows < 100L) == 6)
      val r = ManifestTable.maintain(spark, path, targetRows = 100L,
        maxSmallFiles = 4)
      assert(r.smallFilesFolded && !r.compactedFileCount)
      val after = ManifestTable.readManifest(spark, path)
      assert(after.entries.count(_.rows < 100L) <= 1)
      assert(ManifestTable.read(spark, path).count() == 2006L)
    } finally cleanup(path)
  }
}
