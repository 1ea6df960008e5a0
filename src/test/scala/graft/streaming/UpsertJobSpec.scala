package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.io.ManifestTable
import graft.jobs.StreamingUpsertJob

/** CDC ingestion into the manifest table (StreamingJobs
  * .streamingTableUpsert): bootstrap from the first drop, copy-on-write
  * upserts per micro-batch, CDF-mode deletes, and replay convergence. */
class UpsertJobSpec extends SparkSpec {
  import spark.implicits._

  private def drop(root: String, name: String, df: DataFrame): Unit = {
    df.coalesce(1).write.parquet(s"$root/stage_$name")
    scala.util.Using.resource(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/stage_$name")))(
      _.filter(_.toString.endsWith(".parquet"))
        .forEach(f => java.nio.file.Files.move(f,
          java.nio.file.Paths.get(s"$root/watch/$name.parquet"))))
  }

  private def content(path: String): Set[(Long, String)] =
    ManifestTable.read(spark, path).as[(Long, String)].collect().toSet

  test("upsert stream: bootstrap, then copy-on-write merges per drop; " +
    "replayed batch converges without changing content") {
    val root = java.nio.file.Files.createTempDirectory("graft_ups").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"
    def run(): Unit = {
      val q = StreamingUpsertJob.start(spark, s"$root/watch", table, "id",
        s"$root/ckpt", schemaDdl = Some("id LONG, v STRING"), numFiles = 2)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      drop(root, "b1", (0L to 9L).map(i => (i, s"v$i")).toDF("id", "v"))
      run()
      assert(content(table) == (0L to 9L).map(i => (i, s"v$i")).toSet)

      drop(root, "b2", Seq((3L, "updated"), (20L, "new")).toDF("id", "v"))
      run()
      val after = (0L to 9L).map(i =>
        (i, if (i == 3) "updated" else s"v$i")).toSet + ((20L, "new"))
      assert(content(table) == after)

      // replay convergence: re-merging b2's content (what a crash
      // between merge and checkpoint commit causes) changes nothing
      val vBefore = ManifestTable.latestVersion(spark, table).get
      ManifestTable.merge(spark, table,
        Seq((3L, "updated"), (20L, "new")).toDF("id", "v"))
      assert(content(table) == after, "replay must converge")
      assert(ManifestTable.latestVersion(spark, table).contains(vBefore + 1),
        "replay burns only a version")
    } finally graft.io.Fs.deleteRecursively(
      java.nio.file.Paths.get(root))
  }

  test("kill/recovery e2e: a crash AFTER the merge but BEFORE the " +
    "checkpoint commit replays the epoch; the table converges to the " +
    "same content, burning exactly one version") {
    val root = java.nio.file.Files.createTempDirectory("graft_upskill").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"
    def run(): Unit = {
      val q = StreamingUpsertJob.start(spark, s"$root/watch", table, "id",
        s"$root/ckpt", schemaDdl = Some("id LONG, v STRING"), numFiles = 2)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      // epoch 0 commits cleanly (bootstrap)
      drop(root, "b1", (0L to 9L).map(i => (i, s"v$i")).toDF("id", "v"))
      run()
      val expect = ((0L to 9L).map(i => (i, s"v$i")).toSet - ((3L, "v3"))) +
        ((3L, "upd")) + ((50L, "new"))

      // THE CRASH: epoch 1's foreachBatch ran the merge to completion
      // but the engine died before the checkpoint commit log — emulate
      // by performing the exact batch body out-of-band, then make the
      // drop visible and restart from the same checkpoint
      ManifestTable.merge(spark, table,
        Seq((3L, "upd"), (50L, "new")).toDF("id", "v"))
      assert(content(table) == expect)
      val vAfterCrash = ManifestTable.latestVersion(spark, table).get

      drop(root, "b2", Seq((3L, "upd"), (50L, "new")).toDF("id", "v"))
      run() // replays the batch as epoch 1

      assert(content(table) == expect,
        "replayed epoch must converge to identical content")
      assert(ManifestTable.latestVersion(spark, table)
        .contains(vAfterCrash + 1),
        "a replay burns exactly one version, nothing else")
    } finally graft.io.Fs.deleteRecursively(
      java.nio.file.Paths.get(root))
  }

  test("cdf stream: post-images upsert, deletes delete; bootstrap " +
    "filters to post-images") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsc").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"
    def run(): Unit = {
      val q = StreamingUpsertJob.start(spark, s"$root/watch", table, "id",
        s"$root/ckpt", schemaDdl = Some("_change_type STRING, id LONG, v STRING"),
        numFiles = 2, cdf = true)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      drop(root, "c1", Seq(("insert", 1L, "a"), ("insert", 2L, "b"),
        ("delete", 9L, "gone")).toDF("_change_type", "id", "v"))
      run()
      assert(content(table) == Set((1L, "a"), (2L, "b")),
        "bootstrap keeps post-images only")

      drop(root, "c2", Seq(("update_pre", 1L, "a"), ("update_post", 1L, "a2"),
        ("delete", 2L, "b"), ("insert", 3L, "c"))
        .toDF("_change_type", "id", "v"))
      run()
      assert(content(table) == Set((1L, "a2"), (3L, "c")))
    } finally graft.io.Fs.deleteRecursively(
      java.nio.file.Paths.get(root))
  }

  test("dv stream: micro-batches land as deletion-vector commits — " +
    "bootstrap files never rewritten, content converges on replay") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsd").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"
    def run(cdf: Boolean): Unit = {
      val ddl = if (cdf) "_change_type STRING, id LONG, v STRING"
                else "id LONG, v STRING"
      val q = StreamingUpsertJob.start(spark, s"$root/watch", table, "id",
        s"$root/ckpt", schemaDdl = Some(ddl), numFiles = 2,
        cdf = cdf, dv = true)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      drop(root, "d1", (0L to 9L).map(i => (i, s"v$i")).toDF("id", "v"))
      run(cdf = false)
      val m0 = ManifestTable.readManifest(spark, table)
      val bootRels = m0.entries.map(_.relPath).toSet
      val bootSig = bootRels.map { rel =>
        val p = java.nio.file.Paths.get(s"$table/$rel")
        rel -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
      }.toMap

      drop(root, "d2", Seq((3L, "updated"), (20L, "new")).toDF("id", "v"))
      run(cdf = false)
      val after = (0L to 9L).map(i =>
        (i, if (i == 3) "updated" else s"v$i")).toSet + ((20L, "new"))
      assert(content(table) == after)
      // the dv path's whole point: bootstrap files are byte-untouched —
      // the replaced row died in a sidecar, the batch appended
      val m1 = ManifestTable.readManifest(spark, table)
      assert(bootRels.subsetOf(m1.entries.map(_.relPath).toSet),
        "bootstrap files must be carried, not rewritten")
      bootSig.foreach { case (rel, sig) =>
        val p = java.nio.file.Paths.get(s"$table/$rel")
        assert((java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis) == sig,
          s"$rel was rewritten")
      }
      assert(m1.entries.exists(_.dv.isDefined))

      // replay convergence (crash between commit and checkpoint): the
      // exact batch body re-runs; content identical, one version burned
      val vBefore = ManifestTable.latestVersion(spark, table).get
      ManifestTable.upsertDV(spark, table,
        Seq((3L, "updated"), (20L, "new")).toDF("id", "v"))
      assert(content(table) == after, "dv replay must converge")
      assert(ManifestTable.latestVersion(spark, table).contains(vBefore + 1))
    } finally graft.io.Fs.deleteRecursively(
      java.nio.file.Paths.get(root))
  }

  test("dv cdf stream: the feed applies through one dv commit per " +
    "micro-batch; deletes of absent keys still advance cleanly") {
    val root = java.nio.file.Files.createTempDirectory("graft_upsdc").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"
    def run(): Unit = {
      val q = StreamingUpsertJob.start(spark, s"$root/watch", table, "id",
        s"$root/ckpt",
        schemaDdl = Some("_change_type STRING, id LONG, v STRING"),
        numFiles = 2, cdf = true, dv = true)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      drop(root, "c1", Seq(("insert", 1L, "a"), ("insert", 2L, "b"),
        ("insert", 4L, "d")).toDF("_change_type", "id", "v"))
      run()
      drop(root, "c2", Seq(("update_pre", 1L, "a"), ("update_post", 1L, "a2"),
        ("delete", 2L, "b"), ("insert", 3L, "c"), ("delete", 99L, "absent"))
        .toDF("_change_type", "id", "v"))
      run()
      assert(content(table) == Set((1L, "a2"), (3L, "c"), (4L, "d")))
    } finally graft.io.Fs.deleteRecursively(
      java.nio.file.Paths.get(root))
  }
}
