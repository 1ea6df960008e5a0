package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** COLUMN MAPPING: rename and drop are METADATA-ONLY commits — data
  * files keep their physical column names forever, so at 100 TB the
  * ops cost one manifest write and zero data files. These tests pin
  * the three load-bearing invariants: (1) the commits touch no data
  * file (byte-identity), (2) every read/write path speaks LOGICAL
  * names while disk stays PHYSICAL (merge, dv, CDF, time travel,
  * restore, compaction, pruning all survive a rename), and (3) a
  * dropped column's physical name is retired — re-adding the same
  * logical name can never resurrect stale values. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cmap").toString + "/t"

  private def base(n: Int = 1000): DataFrame =
    (0 until n).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  /** relPath -> content digest of every data file (byte-identity pin). */
  private def dataFiles(path: String): Map[String, String] = {
    val root = java.nio.file.Paths.get(path)
    val out = scala.collection.mutable.Map[String, String]()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    java.nio.file.Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (rel.startsWith("data/") && rel.endsWith(".parquet"))
        out += rel -> java.util.Base64.getEncoder.encodeToString(
          md.digest(java.nio.file.Files.readAllBytes(p)))
    }
    out.toMap
  }

  test("rename is metadata-only: zero data files touched, values intact, " +
    "old files stay physically old-named on disk") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      val before = dataFiles(path)
      ManifestTable.renameColumn(spark, path, "name", "title")
      assert(dataFiles(path) == before,
        "rename must not add, remove, or rewrite any data file")
      val m = ManifestTable.readManifest(spark, path)
      assert(m.schema.fieldNames.toSeq == Seq("id", "title", "grp"))
      assert(m.colMap == Seq("title" -> "name"))
      assert(m.op == "rename-column(name->title)")
      val got = ManifestTable.read(spark, path)
        .select("id", "title").as[(Long, String)].collect().toMap
      assert(got(7L) == "name_7" && got.size == 1000)
      // the physical file really still carries the OLD name
      val anyFile = before.keys.head
      val raw = spark.read.parquet(s"$path/$anyFile")
      assert(raw.columns.contains("name") && !raw.columns.contains("title"))
    } finally cleanup(path)
  }

  test("merge after rename: logical-name batches land; NEW files are " +
    "written under the stable PHYSICAL name; stats stay tight") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4,
        statsCols = Seq("grp"))
      ManifestTable.renameColumn(spark, path, "name", "title")
      val batch = Seq((5L, "upd_5", 99), (5000L, "ins", 99))
        .toDF("id", "title", "grp")
      val st = ManifestTable.merge(spark, path, batch)
      val m = ManifestTable.readManifest(spark, path)
      assert(st.version == m.version)
      // an OLD-named batch must be refused loudly (schema is logical)
      val e = intercept[IllegalArgumentException] {
        ManifestTable.merge(spark, path,
          Seq((6L, "x", 1)).toDF("id", "name", "grp"))
      }
      assert(e.getMessage.contains("name"))
      // content
      val got = ManifestTable.read(spark, path)
        .select("id", "title").as[(Long, String)].collect().toMap
      assert(got(5L) == "upd_5" && got(5000L) == "ins" && got(6L) == "name_6")
      // every data file on disk — old and freshly merged — carries the
      // PHYSICAL name; a mixed-name layout would break the uniform scan
      m.entries.foreach { en =>
        val cols = spark.read.parquet(s"$path/${en.relPath}").columns.toSet
        assert(cols.contains("name") && !cols.contains("title"),
          s"file ${en.relPath} must be physically old-named, got $cols")
      }
      // renamed statsCols still key the manifest stats (values carried)
      assert(m.statsCols == Seq("grp"))
      assert(m.entries.forall(e => e.extra.contains("grp")))
    } finally cleanup(path)
  }

  test("rename of the MERGE KEY: key-ranged touch sets, dv deletes, and " +
    "upserts keep working through the mapping") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      ManifestTable.renameColumn(spark, path, "id", "doc_id")
      val m1 = ManifestTable.readManifest(spark, path)
      assert(m1.keyCol == "doc_id" && m1.colMap == Seq("doc_id" -> "id"))
      // copy-on-write upsert on the renamed key
      val st = ManifestTable.merge(spark, path,
        Seq((3L, "upd_3", 0)).toDF("doc_id", "name", "grp"))
      assert(st.filesRewritten == 1,
        s"key-local batch must touch one file, got $st")
      // deletion-vector delete on the renamed key (physical anti-join)
      ManifestTable.deleteKeysDV(spark, path,
        Seq(10L, 11L).toDF("doc_id"))
      val got = ManifestTable.read(spark, path)
        .select("doc_id", "name").as[(Long, String)].collect().toMap
      assert(got(3L) == "upd_3" && !got.contains(10L) && !got.contains(11L))
      assert(got.size == 998)
    } finally cleanup(path)
  }

  test("time travel reads each version under ITS OWN names; restore " +
    "across a rename translates to the current names") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        keepVersions = 4)
      ManifestTable.merge(spark, path,
        Seq((5L, "upd_5", 9)).toDF("id", "name", "grp")) // v2
      ManifestTable.renameColumn(spark, path, "name", "title") // v3
      // v2 still reads under the OLD logical name
      assert(ManifestTable.readAt(spark, path, 2L).columns.toSeq ==
        Seq("id", "name", "grp"))
      // restore to v2 (pre-rename DATA) keeps the CURRENT schema names
      ManifestTable.restoreVersion(spark, path, 2L) // v4
      val m = ManifestTable.readManifest(spark, path)
      assert(m.schema.fieldNames.toSeq == Seq("id", "title", "grp"))
      val got = ManifestTable.read(spark, path)
        .select("id", "title").as[(Long, String)].collect().toMap
      assert(got(5L) == "upd_5" && got.size == 100)
    } finally cleanup(path)
  }

  test("CDF window spanning a rename emits TO-side names; the rename " +
    "commit itself contributes zero changes") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        keepVersions = 5)
      ManifestTable.renameColumn(spark, path, "name", "title") // v2
      ManifestTable.merge(spark, path,
        Seq((5L, "upd_5", 9)).toDF("id", "title", "grp")) // v3
      // the window spans the rename: emitted in NEW names
      val ch = ManifestTable.changesBetween(spark, path, 1L, 3L)
      assert(ch.columns.contains("title") && !ch.columns.contains("name"))
      val types = ch.select("_change_type", "id")
        .as[(String, Long)].collect().toSet
      assert(types == Set(("update_pre", 5L), ("update_post", 5L)),
        s"only key 5 changed; rename alone must emit nothing, got $types")
      // pure-rename window: exactly empty
      assert(ManifestTable.changesBetween(spark, path, 1L, 2L).count() == 0L)
    } finally cleanup(path)
  }

  test("drop is metadata-only and the physical name is RETIRED: " +
    "re-adding the same logical column yields NULLs, never stale bytes") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2)
      val before = dataFiles(path)
      ManifestTable.dropColumn(spark, path, "name") // v2
      assert(dataFiles(path) == before,
        "drop must not touch any data file")
      val m2 = ManifestTable.readManifest(spark, path)
      assert(m2.schema.fieldNames.toSeq == Seq("id", "grp"))
      assert(m2.retiredPhys == Seq("name"))
      assert(!ManifestTable.read(spark, path).columns.contains("name"))
      // re-add the SAME logical name: gets a fresh physical, so the old
      // files' still-present 'name' bytes must NOT resurrect
      ManifestTable.evolveSchema(spark, path, StructType(Seq(
        StructField("name", org.apache.spark.sql.types.StringType)))) // v3
      val m3 = ManifestTable.readManifest(spark, path)
      assert(m3.colMap.nonEmpty && m3.colMap.head._1 == "name" &&
        m3.colMap.head._2 != "name",
        s"re-added column must map to a fresh physical name, got ${m3.colMap}")
      val vals = ManifestTable.read(spark, path).select("name")
        .as[Option[String]].collect()
      assert(vals.forall(_.isEmpty),
        "old files' dropped bytes resurrected into the re-added column")
      // and a merge writing the new column round-trips it
      ManifestTable.merge(spark, path,
        Seq((3L, 0, "fresh")).toDF("id", "grp", "name"))
      val got = ManifestTable.read(spark, path)
        .select("id", "name").as[(Long, Option[String])].collect().toMap
      assert(got(3L).contains("fresh") && got(4L).isEmpty)
    } finally cleanup(path)
  }

  test("refusals: bad rename targets, dropping load-bearing columns, " +
    "constraint-referenced columns") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        checkConstraints = Seq("grp_bounds" -> "grp >= 0 AND grp < 7"))
      intercept[IllegalArgumentException] {
        ManifestTable.renameColumn(spark, path, "nope", "x") }
      intercept[IllegalArgumentException] {
        ManifestTable.renameColumn(spark, path, "name", "grp") }
      intercept[IllegalArgumentException] {
        ManifestTable.dropColumn(spark, path, "id") } // merge key
      // constraint references grp → rename AND drop both refused
      val e1 = intercept[IllegalArgumentException] {
        ManifestTable.renameColumn(spark, path, "grp", "bucket") }
      assert(e1.getMessage.contains("grp_bounds"))
      val e2 = intercept[IllegalArgumentException] {
        ManifestTable.dropColumn(spark, path, "grp") }
      assert(e2.getMessage.contains("grp_bounds"))
      // drop the constraint → rename proceeds, and the write-path gate
      // is gone with it
      ManifestTable.dropCheckConstraint(spark, path, "grp_bounds")
      ManifestTable.renameColumn(spark, path, "grp", "bucket")
      assert(ManifestTable.readManifest(spark, path).schema.fieldNames
        .contains("bucket"))
      // refusals burned no version beyond the two real commits
      val m = ManifestTable.readManifest(spark, path)
      assert(m.version == 3L, s"refused ops must not commit, at v${m.version}")
    } finally cleanup(path)
  }

  test("maintenance through a mapping: compactSmallFiles and compactTable " +
    "rewrite under the PHYSICAL names and change no content") {
    val path = tmp()
    try {
      ManifestTable.create(base(1000), path, "id", numFiles = 2)
      ManifestTable.renameColumn(spark, path, "name", "title")
      // fragment with two small inserts, then fold
      ManifestTable.merge(spark, path,
        Seq((5000L, "a", 1)).toDF("id", "title", "grp"))
      ManifestTable.merge(spark, path,
        Seq((5001L, "b", 2)).toDF("id", "title", "grp"))
      ManifestTable.compactSmallFiles(spark, path, targetRows = 100L)
      val m = ManifestTable.readManifest(spark, path)
      m.entries.foreach { en =>
        val cols = spark.read.parquet(s"$path/${en.relPath}").columns.toSet
        assert(cols.contains("name") && !cols.contains("title"),
          s"compacted file ${en.relPath} must stay physically named: $cols")
      }
      ManifestTable.compactTable(spark, path, numFiles = 3)
      val got = ManifestTable.read(spark, path)
        .select("id", "title").as[(Long, String)].collect().toMap
      assert(got.size == 1002 && got(5L) == "name_5" && got(5000L) == "a")
    } finally cleanup(path)
  }

  test("partitioned table: renaming the PARTITION column keeps the " +
    "metadata-only partition ops addressable") {
    val path = tmp()
    try {
      val df = (0 until 300).map(i => (i.toLong, s"P${i % 3}", i))
        .toDF("id", "pri", "v")
      ManifestTable.createPartitioned(df, path, "id", "pri")
      ManifestTable.renameColumn(spark, path, "pri", "priority")
      val m = ManifestTable.readManifest(spark, path)
      assert(m.partCols.contains("priority") &&
        m.statsCols.contains("priority"))
      ManifestTable.deletePartitions(spark, path, Seq("P0"))
      val got = ManifestTable.read(spark, path).groupBy("priority").count()
        .as[(String, Long)].collect().toMap
      assert(got == Map("P1" -> 100L, "P2" -> 100L))
      // and reads prune driver-side on the renamed column
      assert(ManifestTable.readPartitions(spark, path, Seq("P1"))
        .count() == 100L)
    } finally cleanup(path)
  }

  test("prunedRead on a renamed stats column still cuts the file list " +
    "from the manifest") {
    val path = tmp()
    try {
      val df = (0 until 1000).map(i => (i.toLong, i / 100, s"r$i"))
        .toDF("id", "bucket", "payload")
      ManifestTable.create(df, path, "id", numFiles = 10,
        statsCols = Seq("bucket"))
      ManifestTable.renameColumn(spark, path, "bucket", "decile")
      val pruned = ManifestTable.prunedRead(spark, path, "decile", 2, 2)
        .filter(col("decile") === 2)
      assert(pruned.count() == 100L)
      // key-sorted on id → bucket ranges align; the prune must have cut
      // most files (conservative: fewer than half survive)
      val scanned = pruned.select(input_file_name()).distinct().count()
      assert(scanned <= 3L, s"prune left $scanned files for one decile")
    } finally cleanup(path)
  }

  test("rename back to the original name empties the map (identity pairs " +
    "never persist)") {
    val path = tmp()
    try {
      ManifestTable.create(base(50), path, "id", numFiles = 1)
      ManifestTable.renameColumn(spark, path, "name", "title")
      ManifestTable.renameColumn(spark, path, "title", "name")
      val m = ManifestTable.readManifest(spark, path)
      assert(m.colMap.isEmpty,
        s"round-trip rename must restore the identity map, got ${m.colMap}")
      assert(ManifestTable.read(spark, path).columns.toSeq ==
        Seq("id", "name", "grp"))
    } finally cleanup(path)
  }
}
