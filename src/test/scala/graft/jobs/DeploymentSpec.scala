package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.ManifestTable

/** CAPSTONE e2e: the full multi-job deployment the lakehouse layer
  * exists for, all running at once against one table family —
  * streaming CDC ingest (StreamingUpsertJob) committing to the source
  * table, table MAINTENANCE (compaction) racing those commits through
  * the optimistic-concurrency protocol, and BOTH continuous consumers
  * (mirror + agg view) folding the change feed downstream — then
  * everything must converge: source = sum of all drops, mirror =
  * source, view = recompute. No coordination between the four jobs
  * beyond the manifest protocol itself. */
class DeploymentSpec extends SparkSpec {
  import spark.implicits._

  private def drop(root: String, name: String, df: DataFrame): Unit = {
    df.coalesce(1).write.parquet(s"$root/stage_$name")
    scala.util.Using.resource(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/stage_$name")))(
      _.filter(_.toString.endsWith(".parquet"))
        .forEach(f => java.nio.file.Files.move(f,
          java.nio.file.Paths.get(s"$root/watch/$name.parquet"))))
  }

  test("streaming ingest + racing compaction + continuous mirror & view " +
    "all converge with no coordination beyond the manifest protocol") {
    val root = java.nio.file.Files.createTempDirectory("graft_deploy")
      .toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"; val mirror = s"$root/mirror"
    val view = s"$root/view"
    def content(p: String): Set[(Long, String, Long)] =
      ManifestTable.read(spark, p).as[(Long, String, Long)].collect().toSet

    // the ingest stream (one drop per micro-batch) and both consumers
    val ingest = StreamingUpsertJob.start(spark, s"$root/watch", table,
      "id", s"$root/ckpt", schemaDdl = Some("id LONG, grp STRING, v LONG"),
      numFiles = 2)
    var mirrorQ: org.apache.spark.sql.streaming.StreamingQuery = null
    var viewQ: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // first drop bootstraps the table; consumers start after it
      // exists (their bootstrap needs a committed source manifest)
      drop(root, "b0", (0L until 100L).map(i => (i, s"g${i % 4}", i))
        .toDF("id", "grp", "v"))
      ingest.processAllAvailable()
      assert(ManifestTable.latestVersion(spark, table).contains(1L))
      // the burst-retention operating pattern: commits will land faster
      // than the consumers' poll cadence, so widen the window before
      // the burst — a consumer that misses intermediate versions then
      // syncs a multi-hop diff instead of failing past retention
      ManifestTable.setRetention(spark, table, 10)
      mirrorQ = StreamingChangeFeedJob.startMirror(spark, table, mirror,
        intervalMs = 150)
      viewQ = StreamingChangeFeedJob.startAggView(spark, table, view,
        "grp", "v", intervalMs = 150)

      // a burst of key-local update/insert drops chewed by the stream
      // thread while the MAIN thread runs table maintenance — the
      // compaction and the micro-batch merges contend for versions and
      // must serialize through rebase/re-drive, never corrupt (each
      // drop's key band is disjoint, so apply order is immaterial)
      (1 to 5).foreach { k =>
        drop(root, s"b$k",
          ((k * 10L until k * 10L + 10L).map(i => (i, s"g${i % 4}", i * 100L))
            :+ ((1000L + k, "gX", k.toLong))).toDF("id", "grp", "v"))
      }
      Thread.sleep(400) // let some micro-batches be mid-flight
      ManifestTable.compactTable(spark, table, numFiles = 2,
        maxRetries = 10)
      ingest.processAllAvailable()

      // expected final state: drops applied in order (later drops win
      // on overlapping keys — each key band here is disjoint)
      val expect = ((0L until 100L).map { i =>
        val updated = i >= 10L && i < 60L
        (i, s"g${i % 4}", if (updated) i * 100L else i)
      } ++ (1 to 5).map(k => (1000L + k, "gX", k.toLong))).toSet
      assert(content(table) == expect, "source must be the drop fold")

      // consumers converge without any external driver: poll until the
      // mirror tag reaches the source's latest version
      val latest = ManifestTable.latestVersion(spark, table).get
      val t0 = System.currentTimeMillis
      def caughtUp(p: String) =
        ManifestTable.latestVersion(spark, p).isDefined &&
        ManifestTable.readTag(spark, p).exists(
          t => t.forall(_.isDigit) && t.toLong >= latest)
      while ((!caughtUp(mirror) || !caughtUp(view)) &&
          System.currentTimeMillis - t0 < 120000) Thread.sleep(150)
      assert(caughtUp(mirror) && caughtUp(view),
        "consumers must catch up unaided")
      assert(content(mirror) == expect, "mirror must equal the source")
      val expectView = expect.groupBy(_._2).map { case (g, rows) =>
        (g, rows.size.toLong, rows.map(_._3).sum) }.toSet
      assert(ManifestTable.read(spark, view)
        .as[(String, Long, Long)].collect().toSet == expectView,
        "view must equal the recompute")
    } finally {
      if (mirrorQ != null) mirrorQ.stop()
      if (viewQ != null) viewQ.stop()
      ingest.stop()
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }
}
