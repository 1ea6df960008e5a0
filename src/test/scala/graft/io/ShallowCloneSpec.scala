package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** shallowClone — a metadata-only table copy that borrows the source's
  * data files: zero data bytes copied, full independence afterwards,
  * and the documented source-vacuum lifetime hazard. */
class ShallowCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sc").toString

  private def df: DataFrame =
    (0 until 1000).map(i => (i.toLong, i * 10L,
      s"${('A' + i % 3).toChar}")).toDF("id", "cents", "prio")

  private def dataBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return 0L
    var n = 0L
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet") &&
          p.toString.contains("/data/") &&
          !p.getParent.getFileName.toString.endsWith("-dv"))
        n += java.nio.file.Files.size(p)
    }
    n
  }

  test("a clone copies no data bytes, reads identically, and diverges " +
    "from the source on merge — in both directions") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 8,
        statsCols = Seq("prio"))
      val srcBytes = dataBytes(src)
      ManifestTable.shallowClone(spark, src, dst)
      assert(dataBytes(dst) == 0L, "clone must copy no data file")
      assert(ManifestTable.read(spark, dst).agg(sum("cents"))
        .first().getLong(0) ==
        ManifestTable.read(spark, src).agg(sum("cents"))
          .first().getLong(0))
      // clone mutates; source untouched (bytes AND rows)
      ManifestTable.merge(spark, dst,
        Seq((5000L, 1L, "X"), (0L, 999L, "X")).toDF("id", "cents", "prio"))
      assert(dataBytes(src) == srcBytes)
      assert(ManifestTable.read(spark, src).count() == 1000L)
      val d = ManifestTable.read(spark, dst)
      assert(d.count() == 1001L)
      assert(d.filter(col("id") === 0L).first().getLong(1) == 999L)
      // source mutates; clone untouched
      ManifestTable.deleteKeys(spark, src,
        (0L until 500L).toDF("id"))
      assert(ManifestTable.read(spark, src).count() == 500L)
      assert(ManifestTable.read(spark, dst).count() == 1001L)
      // readWhere prunes on borrowed entries' stats too
      assert(ManifestTable.readWhere(spark, dst,
        col("id").between(100L, 150L) && col("prio") =!= "X").count() == 51L)
    } finally Fs.deleteRecursively(root)
  }

  test("a RELATIVE srcPath is qualified at clone time: borrowed entries " +
    "must never resolve against the clone's root") {
    // relative to the test JVM's CWD (the sbt project root)
    val rel = s"target/graft_sc_rel_${System.nanoTime()}"
    val dstRoot = tmp()
    try {
      ManifestTable.create(df, s"$rel/src", "id", numFiles = 4)
      ManifestTable.shallowClone(spark, s"$rel/src", s"$dstRoot/dst")
      val m = ManifestTable.readManifest(spark, s"$dstRoot/dst")
      assert(m.entries.forall(e =>
        e.relPath.startsWith("/") || ManifestTable.isQualified(e.relPath)),
        s"borrowed entries must be absolute, got ${m.entries.head.relPath}")
      // the actual failure mode was a FileNotFound on first read
      assert(ManifestTable.read(spark, s"$dstRoot/dst").count() == 1000L)
    } finally {
      Fs.deleteRecursively(java.nio.file.Paths.get(rel))
      Fs.deleteRecursively(dstRoot)
    }
  }

  test("deletion vectors: the clone copies source sidecars (owning its " +
    "dead-row bookkeeping) and can dv-delete on borrowed files") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 4)
      ManifestTable.deleteKeysDV(spark, src,
        df.filter(col("id") % 10 === 3).select("id"))
      ManifestTable.shallowClone(spark, src, dst)
      assert(ManifestTable.read(spark, dst).count() == 900L)
      // clone dv-deletes more, on files it only borrows
      val st = ManifestTable.deleteKeysDV(spark, dst,
        Seq(4L, 14L, 24L).toDF("id"))
      assert(st.deadMarked == 3L)
      assert(ManifestTable.read(spark, dst).count() == 897L)
      assert(ManifestTable.read(spark, src).count() == 900L)
      assert(dataBytes(dst) == 0L, "dv commits write sidecars, not data")
    } finally Fs.deleteRecursively(root)
  }

  test("compactTable severs the clone: every entry goes local and " +
    "source retention can no longer break it") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 4)
      ManifestTable.shallowClone(spark, src, dst)
      ManifestTable.compactTable(spark, dst, numFiles = 2)
      val m = ManifestTable.readManifest(spark, dst)
      assert(m.entries.forall(e => !e.relPath.startsWith("/")),
        "post-compaction entries must be local")
      assert(dataBytes(dst) > 0L)
      // source gone entirely -> severed clone still reads
      Fs.deleteRecursively(src)
      assert(ManifestTable.read(spark, dst).count() == 1000L)
    } finally Fs.deleteRecursively(root)
  }

  test("the lifetime hazard is LOUD: source churn past retention breaks " +
    "an unsevered clone's read") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 4)
      ManifestTable.shallowClone(spark, src, dst)
      // rewrite every source file, churn past retention, sweep with
      // zero grace so the borrowed bytes really go away
      spark.conf.set("graft.manifest.orphanGraceMs", "0")
      try {
        ManifestTable.compactTable(spark, src, numFiles = 2)
        ManifestTable.compactTable(spark, src, numFiles = 4)
        ManifestTable.compactTable(spark, src, numFiles = 2)
        ManifestTable.vacuum(spark, src)
      } finally spark.conf.unset("graft.manifest.orphanGraceMs")
      val e = intercept[Exception] {
        ManifestTable.read(spark, dst).count()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16).toSeq
      assert(chain(e).exists(t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(t.getMessage).contains("does not exist") ||
        String.valueOf(t.getMessage).contains("FileNotFound")))
      // a fresh clone of the compacted source works again
      val dst2 = s"$root/dst2"
      ManifestTable.shallowClone(spark, src, dst2)
      assert(ManifestTable.read(spark, dst2).count() == 1000L)
    } finally Fs.deleteRecursively(root)
  }

  test("severClone localizes every borrowed byte: the severed clone " +
    "survives the exact churn that breaks an unsevered one; severing " +
    "twice is a no-op") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 4)
      ManifestTable.shallowClone(spark, src, dst)
      assert(ManifestTable.severClone(spark, dst))
      val m = ManifestTable.readManifest(spark, dst)
      assert(m.entries.forall(e => !e.relPath.startsWith("/") &&
        !ManifestTable.isQualified(e.relPath)),
        "severed clone must hold only LOCAL entries")
      assert(!ManifestTable.severClone(spark, dst), "idempotent no-op")
      // the hazard churn from the test above — now harmless
      spark.conf.set("graft.manifest.orphanGraceMs", "0")
      try {
        ManifestTable.compactTable(spark, src, numFiles = 2)
        ManifestTable.compactTable(spark, src, numFiles = 4)
        ManifestTable.compactTable(spark, src, numFiles = 2)
        ManifestTable.vacuum(spark, src)
      } finally spark.conf.unset("graft.manifest.orphanGraceMs")
      assert(ManifestTable.read(spark, dst).count() == 1000L)
      assert(ManifestTable.read(spark, dst).agg(sum("cents"))
        .first().getLong(0) ==
        df.agg(sum("cents")).first().getLong(0))
    } finally Fs.deleteRecursively(root)
  }

  test("vacuumPreview(registry) lists borrow-breaking retirements: the " +
    "unsevered borrower shows up, the severed one does not") {
    val root = tmp()
    val src = s"$root/src"
    val live = s"$root/live"; val safe = s"$root/safe"
    try {
      ManifestTable.create(df, src, "id", numFiles = 4)
      ManifestTable.shallowClone(spark, src, live)
      ManifestTable.shallowClone(spark, src, safe)
      ManifestTable.severClone(spark, safe)
      // churn the source so the originally-borrowed files leave the
      // retention window — under the DEFAULT grace, so the commits' own
      // sweeps leave them in place and the preview gets to plan them
      ManifestTable.compactTable(spark, src, numFiles = 2)
      ManifestTable.compactTable(spark, src, numFiles = 4)
      ManifestTable.compactTable(spark, src, numFiles = 2)
      // zero grace only NOW: the preview (and the sweep it predicts)
      // sees the aged-out borrowed files as deletable
      spark.conf.set("graft.manifest.orphanGraceMs", "0")
      try {
        val plan = ManifestTable.vacuumPreview(spark, src,
          registry = Seq(live, safe))
        assert(plan.files.nonEmpty, "fixture must plan retirements")
        val borrowers = plan.borrowBreaking.map(_._1).toSet
        assert(borrowers == Set(live),
          s"only the unsevered borrower breaks, got $borrowers")
        // every flagged file really is in the planned retirement set
        val plannedAbs = plan.files.map(f => s"$src/$f").toSet
        plan.borrowBreaking.foreach { case (_, f) =>
          assert(plannedAbs.contains(f), s"$f not in the plan") }
        // and the advisory was RIGHT: sweeping breaks live, not safe
        ManifestTable.vacuum(spark, src)
        intercept[Exception] { ManifestTable.read(spark, live).count() }
        assert(ManifestTable.read(spark, safe).count() == 1000L)
      } finally spark.conf.unset("graft.manifest.orphanGraceMs")
    } finally Fs.deleteRecursively(root)
  }

  test("asOfVersion clones a retained snapshot: the fork sees " +
    "yesterday's rows while the source head moved on") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 4, keepVersions = 3)
      val v0 = ManifestTable.readManifest(spark, src).version
      ManifestTable.deleteKeys(spark, src, (0L until 500L).toDF("id"))
      ManifestTable.shallowClone(spark, src, dst, asOfVersion = Some(v0))
      assert(ManifestTable.read(spark, dst).count() == 1000L)
      assert(ManifestTable.read(spark, src).count() == 500L)
    } finally Fs.deleteRecursively(root)
  }

  test("clone carries schema policy: constraints gate the clone's " +
    "writes; cloning onto an existing table is refused") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 2,
        checkConstraints = Seq("pos" -> "cents >= 0"))
      ManifestTable.shallowClone(spark, src, dst)
      intercept[Exception] {
        ManifestTable.merge(spark, dst,
          Seq((1L, -5L, "A")).toDF("id", "cents", "prio"))
      }
      intercept[IllegalArgumentException] {
        ManifestTable.shallowClone(spark, src, dst)
      }
    } finally Fs.deleteRecursively(root)
  }
}
