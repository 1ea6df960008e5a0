package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The manifest's practical ceiling: it is single-level and
  * driver-parsed, so commit/read/touch-set cost must stay O(file count)
  * with bounded driver memory — this spec pins the 10k-file shape (the
  * scaladoc's documented operating bound; production formats shard
  * beyond it). Entries are synthetic (manifest mechanics don't care
  * whether the named parquet exists until a read touches it). */
class ManifestScaleSpec extends SparkSpec {

  private def entries(n: Int): Seq[ManifestTable.FileEntry] =
    (0 until n).map { i =>
      // 10k disjoint key ranges of width 1000, with one tracked
      // secondary column whose ranges overlap mildly
      ManifestTable.FileEntry(s"data/txn-1/part-$i.parquet", 1000L,
        Some((i * 1000L).toString), Some((i * 1000L + 999).toString),
        Map("ts" -> ((i * 10L).toString, (i * 10L + 5000).toString)))
    }

  test("10k-file manifest: write + read + prune stay sub-second and " +
    "byte-bounded on the driver") {
    val root = java.nio.file.Files.createTempDirectory("graft_mscale")
    val path = s"$root/t"
    try {
      // warm the session + codegen paths so the timings below measure
      // manifest mechanics, not first-touch JVM costs
      spark.range(10).count()
      ManifestTable.writeManifest(spark, s"$root/warm", 1L, "id",
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))),
        Seq.empty, entries(10).map(_.copy(extra = Map.empty)),
        constraints = Seq.empty, colMap = Seq.empty, retiredPhys = Seq.empty)
      val es = entries(10000)
      val t0 = System.nanoTime()
      ManifestTable.writeManifest(spark, path, 1L, "id",
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.LongType))),
        Seq("ts"), es, constraints = Seq.empty, colMap = Seq.empty, retiredPhys = Seq.empty)
      val tWrite = (System.nanoTime() - t0) / 1e6
      // the manifest is a flat text file: ~10k lines, single-digit MB
      val bytes = java.nio.file.Files.size(
        java.nio.file.Paths.get(s"$path/manifest-1"))
      assert(bytes < 4L * 1024 * 1024,
        s"10k entries must stay file-listing-sized, got $bytes bytes")

      val t1 = System.nanoTime()
      val m = ManifestTable.readManifest(spark, path)
      val tRead = (System.nanoTime() - t1) / 1e6
      assert(m.entries.size == 10000)
      assert(m.entries(7777).min.contains("7777000"))

      // manifest-level pruning cuts the 10k-interval list BEFORE any
      // parquet footer would open; a narrow slice must keep a handful
      val t2 = System.nanoTime()
      val keyType = m.keyType
      val statted = m.entries
      val ranges = spark.createDataFrame(statted.map { e =>
          (e.relPath, e.extra("ts")._1, e.extra("ts")._2)
        }).toDF("__f", "__mn", "__mx")
        .select(col("__f"), col("__mn").cast("long").as("__mn"),
          col("__mx").cast("long").as("__mx"))
      val keep = ranges.filter(col("__mx") >= 50000L && col("__mn") <= 52000L)
        .count()
      val tTouch = (System.nanoTime() - t2) / 1e6
      assert(keep < 1200, s"narrow slice must prune most files: $keep")

      // generous bounds — the point is O(n) driver work, not machine
      // speed: all three phases complete in single-digit seconds even
      // under full phantom load (measured ~100-600 ms each, see the
      // ManifestTable scaladoc)
      assert(tWrite < 10000 && tRead < 10000 && tTouch < 30000,
        f"write $tWrite%.0f ms / read $tRead%.0f ms / touch $tTouch%.0f ms")
      info(f"10k files: write $tWrite%.0f ms, read $tRead%.0f ms, " +
        f"interval cut $tTouch%.0f ms, manifest $bytes bytes")
    } finally Fs.deleteRecursively(root)
  }

  test("wide deletion-vector touch set: one dv commit re-pointing 400 " +
    "files plans/executes with bounded driver work and a single " +
    "anti-join group") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mscaledv")
    val path = s"$root/t"
    try {
      // 400 real files (0.4k keys each — small, but the shape is what's
      // under test: the per-group isin list, the file-name join, and
      // the per-entry accounting all scale with the touch set)
      val df = (0 until 160000).map(i => (i.toLong, i % 97)).toDF("id", "v")
      ManifestTable.create(df, path, "id", numFiles = 400)
      assert(ManifestTable.readManifest(spark, path).entries.size == 400)

      // stride-400 delete: every file loses exactly one row
      val t0 = System.nanoTime()
      val st = ManifestTable.deleteKeysDV(spark, path,
        (0L until 160000L by 400L).map(Tuple1(_)).toDF("id"))
      val tCommit = (System.nanoTime() - t0) / 1e6
      // range-partitioner boundaries are SAMPLED, so files are uneven:
      // a few hold two strided keys, a few none — the dead count is
      // exact, the repoint count merely near-full
      assert(st.deadMarked == 400L && st.filesRepointed >= 350)

      val t1 = System.nanoTime()
      val n = ManifestTable.read(spark, path).count()
      val tRead = (System.nanoTime() - t1) / 1e6
      assert(n == 159600L)
      val plan =
        ManifestTable.read(spark, path).queryExecution.executedPlan.toString
      assert(plan.split("LeftAnti").length == 2,
        "400 re-pointed files must share ONE sidecar anti-join group")

      // generous wall bounds — the assertion is O(touch set) driver
      // work, not machine speed
      assert(tCommit < 120000 && tRead < 60000,
        f"dv commit $tCommit%.0f ms / read $tRead%.0f ms")
      info(f"400-file dv commit $tCommit%.0f ms, dv read $tRead%.0f ms")
    } finally Fs.deleteRecursively(root)
  }
}
