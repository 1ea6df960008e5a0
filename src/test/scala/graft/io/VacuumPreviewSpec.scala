package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** vacuumPreview — the retention sweep's DRY RUN. The contract worth a
  * spec: the preview must agree with the real deleter. Everything it
  * lists under `files` is gone after the next commit's sweep, nothing
  * else under data/ disappears, and grace-protected orphans move from
  * `pendingGrace` to `files` exactly when the grace elapses. */
class VacuumPreviewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_vac").toString + "/t"

  private def base(n: Int = 200): DataFrame =
    (0 until n).map(i => (i.toLong, s"name_$i")).toDF("id", "name")

  private def dataFiles(path: String): Set[String] = {
    val root = java.nio.file.Paths.get(path, "data")
    if (!java.nio.file.Files.exists(root)) return Set.empty
    val out = Set.newBuilder[String]
    java.nio.file.Files.walk(root).forEach { p =>
      // skip ".part-*.crc" checksum shadows: ChecksumFileSystem hides
      // them from listStatus, so neither the sweep nor the preview ever
      // sees them (they ride along with their data file's lifecycle)
      if (java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("."))
        out += root.getParent.relativize(p).toString
    }
    out.result()
  }

  test("preview lists exactly what the next sweep deletes; grace moves " +
    "orphans from pendingGrace to files; nothing else is touched") {
    val path = tmp()
    val prevGrace = spark.conf.getOption("graft.manifest.orphanGraceMs")
    try {
      // default (long) grace: superseded files are grace-protected
      spark.conf.unset("graft.manifest.orphanGraceMs")
      ManifestTable.create(base(), path, "id", numFiles = 2)
      ManifestTable.merge(spark, path,
        Seq((0L, "upd_0")).toDF("id", "name"))   // v2: rewrites file(s)
      ManifestTable.merge(spark, path,
        Seq((1L, "upd_1")).toDF("id", "name"))   // v3: keepFrom = 2

      val protectedPlan = ManifestTable.vacuumPreview(spark, path)
      assert(protectedPlan.keepFrom == 2L)
      assert(protectedPlan.files.isEmpty,
        s"fresh orphans must be grace-protected: ${protectedPlan.files}")
      assert(protectedPlan.pendingGrace.nonEmpty,
        "v1's superseded files must show as pending")
      assert(protectedPlan.manifests.isEmpty,
        "out-of-window manifests are deleted eagerly by prior sweeps")

      // grace collapsed to zero: the pending set becomes deletable
      spark.conf.set("graft.manifest.orphanGraceMs", "0")
      val plan = ManifestTable.vacuumPreview(spark, path)
      assert(plan.files.toSet == protectedPlan.pendingGrace.toSet,
        "zero grace must promote exactly the pending set")

      // the next commit's sweep must delete exactly the previewed files
      val before = dataFiles(path)
      assert(plan.files.forall(before.contains))
      ManifestTable.setTagOnly(spark, path, "sweep-trigger")
      // the tag commit advanced keepFrom by one — files of the version
      // that just left the window become deletable too; re-preview at
      // the PRE-commit keepFrom caught the stable core, so assert
      // one-sided: previewed ⊆ deleted, and every survivor that the
      // preview did NOT list is still referenced by a kept manifest
      val after = dataFiles(path)
      plan.files.foreach(f =>
        assert(!after.contains(f), s"previewed $f must be swept"))
      val m = ManifestTable.readManifest(spark, path)
      val referenced = (m.version - (m.retain - 1) to m.version)
        .flatMap(v => scala.util.Try(
          ManifestTable.readManifestAt(spark, path, v).entries).toOption
          .getOrElse(Seq.empty))
        .map(_.relPath).toSet
      after.filterNot(_.endsWith("_SUCCESS")).foreach(f =>
        assert(referenced.contains(f),
          s"survivor $f must be referenced by a retained manifest"))
      // content is intact through all of it
      assert(ManifestTable.read(spark, path).count() == 200L)
    } finally {
      prevGrace match {
        case Some(v) => spark.conf.set("graft.manifest.orphanGraceMs", v)
        case None => spark.conf.unset("graft.manifest.orphanGraceMs")
      }
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }
}
