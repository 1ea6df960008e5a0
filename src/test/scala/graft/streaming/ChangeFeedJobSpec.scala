package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.io.{AggView, ManifestTable}
import graft.jobs.StreamingChangeFeedJob

/** The continuous change-feed consumers (StreamingChangeFeedJob): a
  * merge landing on the source table must flow to the mirror / agg view
  * while the stream runs — no external scheduler — and a cold restart
  * (no checkpoint at all) must resume exactly from the destination's
  * tag cursor. Lagging past the source's retention window must fail the
  * QUERY loudly, never skip a window. */
class ChangeFeedJobSpec extends SparkSpec {
  import spark.implicits._

  private def base(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, s"name_$i", i % 5))
      .toDF("id", "name", "grp")

  private def content(path: String): Set[(Long, String, Int)] =
    ManifestTable.read(spark, path)
      .as[(Long, String, Int)].collect().toSet

  private def awaitTag(path: String, want: String,
                       timeoutMs: Long = 60000): Unit = {
    val t0 = System.currentTimeMillis
    while (ManifestTable.latestVersion(spark, path).isEmpty ||
           !ManifestTable.readTag(spark, path).contains(want)) {
      if (System.currentTimeMillis - t0 > timeoutMs)
        fail(s"timeout waiting for tag '$want' on $path (now: " +
          s"${ManifestTable.latestVersion(spark, path)
            .map(_ => ManifestTable.readTag(spark, path))})")
      Thread.sleep(100)
    }
  }

  test("continuous mirror: source merges converge downstream while the " +
    "stream runs; kill + CHECKPOINT-FREE cold restart resumes from the " +
    "destination tag") {
    val root = java.nio.file.Files.createTempDirectory("graft_scf").toString
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(base(300), src, "id", numFiles = 4)
      val q = StreamingChangeFeedJob.startMirror(spark, src, dst,
        intervalMs = 200)
      try {
        awaitTag(dst, "1") // bootstrap happened on a tick
        assert(content(dst) == content(src))
        // merge lands on the SOURCE while the stream runs — the mirror
        // must converge with no external driver
        ManifestTable.merge(spark, src,
          Seq((7L, "live", 9), (999L, "ins", 9)).toDF("id", "name", "grp"))
        awaitTag(dst, "2")
        assert(content(dst) == content(src))
        ManifestTable.deleteKeys(spark, src, Seq(3L, 4L).toDF("id"))
        awaitTag(dst, "3")
        assert(content(dst) == content(src))
      } finally q.stop()
      // THE KILL: stream is down, the source keeps committing
      ManifestTable.merge(spark, src,
        Seq((8L, "after_kill", 1)).toDF("id", "name", "grp"))
      // cold restart — no checkpoint was ever written; the tag is the
      // only cursor and it must be enough
      val q2 = StreamingChangeFeedJob.startMirror(spark, src, dst,
        intervalMs = 200)
      try {
        awaitTag(dst, "4")
        assert(content(dst) == content(src),
          "restart must resume from the tag and catch up")
      } finally q2.stop()
    } finally graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("the continuous mirror converges through PREDICATE DML: a " +
    "deleteWhere spanning both tiers (covered metadata-drop + dv " +
    "boundary) and an updateWhere land while the stream runs") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val root = java.nio.file.Files.createTempDirectory("graft_scfd").toString
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      // 4 key-ranged files of 100: id<150 drops file [0,100) wholesale
      // and dv-vectors the [100,200) boundary; the grp arm kills rows
      // in every remaining file through the same commit
      ManifestTable.create(base(400), src, "id", numFiles = 4)
      val q = StreamingChangeFeedJob.startMirror(spark, src, dst,
        intervalMs = 200)
      try {
        awaitTag(dst, "1")
        assert(content(dst) == content(src))
        val st = ManifestTable.deleteWhere(spark, src,
          col("id") < 150L || col("grp") === 2)
        assert(st.filesDropped >= 1, s"fixture must metadata-drop: $st")
        awaitTag(dst, "2")
        assert(content(dst) == content(src))
        assert(content(dst) == base(400)
          .filter(!(col("id") < 150L || col("grp") === 2))
          .as[(Long, String, Int)].collect().toSet,
          "mirror must equal SQL DELETE semantics, not just the source")
        ManifestTable.updateWhere(spark, src, col("grp") === 3,
          Map("name" -> concat(col("name"), lit("_upd"))))
        awaitTag(dst, "3")
        assert(content(dst) == content(src))
        assert(content(dst).count(_._2.endsWith("_upd")) ==
          content(dst).count(_._3 == 3),
          "every surviving grp=3 row carries the update post-image")
      } finally q.stop()
    } finally graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("continuous agg view: the rollup tracks source mutations " +
    "incrementally while the stream runs, matching a full recompute") {
    val root = java.nio.file.Files.createTempDirectory("graft_scfa").toString
    val src = s"$root/src"; val view = s"$root/view"
    def recompute(): Set[(Int, Long, Long)] =
      ManifestTable.read(spark, src).groupBy("grp")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("id").as("total"))
        .as[(Int, Long, Long)].collect().toSet
    def viewContent(): Set[(Int, Long, Long)] =
      ManifestTable.read(spark, view).as[(Int, Long, Long)].collect().toSet
    try {
      ManifestTable.create(base(200), src, "id", numFiles = 2)
      val q = StreamingChangeFeedJob.startAggView(spark, src, view,
        "grp", "id", intervalMs = 200)
      try {
        awaitTag(view, "1")
        assert(viewContent() == recompute())
        ManifestTable.merge(spark, src,
          Seq((7L, "x", 4), (500L, "y", 4)).toDF("id", "name", "grp"))
        awaitTag(view, "2")
        assert(viewContent() == recompute(),
          "incremental fold must equal the recompute after a merge")
        ManifestTable.deleteKeys(spark, src, Seq(10L, 11L).toDF("id"))
        awaitTag(view, "3")
        assert(viewContent() == recompute())
      } finally q.stop()
    } finally graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("a consumer lagged past the source retention window fails the " +
    "QUERY loudly with the re-bootstrap remedy (never skips a window)") {
    val root = java.nio.file.Files.createTempDirectory("graft_scfl").toString
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(base(50), src, "id", numFiles = 1)
      // bootstrap via the one-shot job, then let the source slide the
      // window past the tag while no stream runs
      graft.jobs.TableMirrorJob.run(spark, src, dst)
      ManifestTable.merge(spark, src, Seq((1L, "a", 1)).toDF("id", "name", "grp"))
      ManifestTable.merge(spark, src, Seq((2L, "b", 1)).toDF("id", "name", "grp"))
      val q = StreamingChangeFeedJob.startMirror(spark, src, dst,
        intervalMs = 100)
      try {
        val t0 = System.currentTimeMillis
        while (q.exception.isEmpty &&
            System.currentTimeMillis - t0 < 60000) Thread.sleep(100)
        val ex = q.exception
        assert(ex.isDefined, "the lagged poll must terminate the query")
        def chain(t: Throwable): Seq[String] =
          if (t == null) Seq.empty
          else Option(t.getMessage).toSeq ++ chain(t.getCause)
        assert(chain(ex.get).exists(_.contains("re-bootstrap")),
          s"expected the re-bootstrap remedy in: ${chain(ex.get)}")
      } finally q.stop()
    } finally graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
