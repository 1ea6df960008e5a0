package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-aware ManifestTable: files are PARTITION-PURE (one
  * partition value per file, recorded in the manifest), so partition
  * drop/overwrite are METADATA-ONLY commits — zero untouched bytes
  * rewritten — and partition reads cut the file list driver-side. The
  * invariant must survive every other commit path (merge, compaction)
  * and retention must clean the nested `__p=` layout. */
class PartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ptab").toString + "/t"

  /** 300 rows over 3 partitions (p0/p1/p2), key-unique. */
  private def base(n: Int = 300): DataFrame =
    (0 until n).map(i => (i.toLong, s"p${i % 3}", s"v_$i"))
      .toDF("id", "pt", "payload")

  private def content(df: DataFrame): Set[(Long, String, String)] =
    df.select("id", "pt", "payload").as[(Long, String, String)].collect().toSet

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  test("createPartitioned: round-trip, partition-pure entries, inventory") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(), path, "id", "pt")
      assert(content(ManifestTable.read(spark, path)) == content(base()))
      val m = ManifestTable.readManifest(spark, path)
      assert(m.partCols.contains("pt") && m.statsCols.headOption.contains("pt"))
      // every file holds exactly one partition value
      m.entries.foreach { e =>
        val (mn, mx) = e.extra("pt")
        assert(mn == mx, s"file ${e.relPath} spans [$mn,$mx]")
      }
      assert(m.entries.map(_.extra("pt")._1).toSet == Set("p0", "p1", "p2"))
      val rows = ManifestTable.describePartitions(spark, path).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(rows == Map("p0" -> 100L, "p1" -> 100L, "p2" -> 100L))
    } finally cleanup(path)
  }

  test("deletePartitions is metadata-only: zero files written, kept " +
    "entries carried verbatim, dropped partition gone") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(), path, "id", "pt")
      val before = ManifestTable.readManifest(spark, path)
      val st = ManifestTable.deletePartitions(spark, path, Seq("p1"))
      assert(st.version == 2L && st.filesRewritten == 0 &&
        st.filesWritten == 0, s"must be metadata-only, got $st")
      val after = ManifestTable.readManifest(spark, path)
      // the kept entries are LITERALLY the same files (zero bytes moved)
      assert(after.entries.map(_.relPath).toSet.subsetOf(
        before.entries.map(_.relPath).toSet))
      assert(after.entries.forall(e => e.extra("pt")._1 != "p1"))
      assert(content(ManifestTable.read(spark, path)) ==
        content(base()).filterNot(_._2 == "p1"))
      // time travel still serves the dropped partition for one cycle
      assert(content(ManifestTable.readAt(spark, path, 1L)) == content(base()))
      // a value matching nothing burns no version
      val st2 = ManifestTable.deletePartitions(spark, path, Seq("nope"))
      assert(st2.filesWritten == 0 &&
        ManifestTable.latestVersion(spark, path).contains(2L),
        "non-matching delete must not burn a version")
    } finally cleanup(path)
  }

  test("overwritePartitions replaces exactly the present partitions; " +
    "others carried by reference") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(), path, "id", "pt")
      val before = ManifestTable.readManifest(spark, path)
      val repl = (0 until 50).map(i => (i.toLong * 3 + 1, "p1", s"new_$i"))
        .toDF("id", "pt", "payload")
      val st = ManifestTable.overwritePartitions(spark, path, repl)
      assert(st.version == 2L && st.filesRewritten == 0)
      val after = ManifestTable.readManifest(spark, path)
      val beforeRel = before.entries.map(_.relPath).toSet
      // untouched partitions: the SAME files by reference
      val carried = after.entries.filter(e => beforeRel(e.relPath))
      assert(carried.forall(e => e.extra("pt")._1 != "p1"))
      assert(carried.map(_.extra("pt")._1).toSet == Set("p0", "p2"))
      assert(content(ManifestTable.read(spark, path)) ==
        content(base()).filterNot(_._2 == "p1") ++
          (0 until 50).map(i => (i.toLong * 3 + 1, "p1", s"new_$i")))
      // EMPTY replacement replaces nothing and burns no version
      ManifestTable.overwritePartitions(spark, path,
        base().filter(lit(false)))
      assert(ManifestTable.latestVersion(spark, path).contains(2L))
      // schema-mismatched replacement refused loudly
      val e = intercept[IllegalArgumentException] {
        ManifestTable.overwritePartitions(spark, path,
          Seq((1L, "p0")).toDF("id", "pt"))
      }
      assert(e.getMessage.contains("schema"))
    } finally cleanup(path)
  }

  test("copy-on-write merge preserves partition purity and the partition " +
    "ops keep working after it") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(), path, "id", "pt")
      // updates inside p0 + an insert into a NEW partition value p9
      val updates = Seq((0L, "p0", "upd_0"), (3L, "p0", "upd_3"),
        (9000L, "p9", "ins")).toDF("id", "pt", "payload")
      ManifestTable.merge(spark, path, updates)
      val m = ManifestTable.readManifest(spark, path)
      m.entries.foreach { e =>
        val (mn, mx) = e.extra("pt")
        assert(mn == mx, s"merge broke purity: ${e.relPath} [$mn,$mx]")
      }
      assert(content(ManifestTable.read(spark, path)) ==
        content(base()) -- Set((0L, "p0", "v_0"), (3L, "p0", "v_3")) ++
          Set((0L, "p0", "upd_0"), (3L, "p0", "upd_3"), (9000L, "p9", "ins")))
      // the merged-in partition is addressable like any other
      assert(content(ManifestTable.readPartitions(spark, path, Seq("p9"))) ==
        Set((9000L, "p9", "ins")))
      ManifestTable.deletePartitions(spark, path, Seq("p9"))
      assert(content(ManifestTable.read(spark, path)) ==
        content(base()) -- Set((0L, "p0", "v_0"), (3L, "p0", "v_3")) ++
          Set((0L, "p0", "upd_0"), (3L, "p0", "upd_3")))
    } finally cleanup(path)
  }

  test("readPartitions prunes driver-side and reads only matching rows") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(), path, "id", "pt")
      assert(content(ManifestTable.readPartitions(spark, path, Seq("p0", "p2")))
        == content(base()).filter(r => r._2 == "p0" || r._2 == "p2"))
      assert(ManifestTable.readPartitions(spark, path, Seq("absent"))
        .count() == 0L)
    } finally cleanup(path)
  }

  test("change feed across a partition drop emits the dropped rows as " +
    "deletes (consumers converge through metadata-only commits)") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(30), path, "id", "pt")
      ManifestTable.deletePartitions(spark, path, Seq("p2"))
      val changes = ManifestTable.changesBetween(spark, path, 1L, 2L)
      val byType = changes.groupBy("_change_type").count()
        .as[(String, Long)].collect().toMap
      assert(byType == Map("delete" -> 10L))
      assert(changes.filter(col("_change_type") === "delete")
        .select("pt").distinct().as[String].collect().toSeq == Seq("p2"))
    } finally cleanup(path)
  }

  test("compactTable keeps the partition layout; Z compaction refuses") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(), path, "id", "pt")
      // several small merges accumulate per-partition file fragments
      ManifestTable.merge(spark, path,
        Seq((1L, "p1", "u1")).toDF("id", "pt", "payload"))
      ManifestTable.merge(spark, path,
        Seq((2L, "p2", "u2")).toDF("id", "pt", "payload"))
      ManifestTable.compactTable(spark, path, numFiles = 3)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.partCols.contains("pt"), "compaction must keep partCol")
      m.entries.foreach { e =>
        val (mn, mx) = e.extra("pt")
        assert(mn == mx, s"compaction broke purity: ${e.relPath}")
      }
      assert(content(ManifestTable.read(spark, path)) ==
        content(base()) -- Set((1L, "p1", "v_1"), (2L, "p2", "v_2")) ++
          Set((1L, "p1", "u1"), (2L, "p2", "u2")))
      val e = intercept[IllegalArgumentException] {
        ManifestTable.compactTableZOrdered(spark, path, 2, "id", "pt")
      }
      assert(e.getMessage.contains("partition"))
    } finally cleanup(path)
  }

  test("createPartitioned(numFiles): a large partition range-splits " +
    "into several pure files with DISJOINT key ranges; partition ops " +
    "stay metadata-only on the multi-file layout") {
    val path = tmp()
    try {
      // 2 values, heavily skewed — the big one must not be one file
      val rows = (0 until 600).map(i =>
        (i.toLong, if (i < 500) "big" else "small", s"v_$i"))
        .toDF("id", "pt", "payload")
      ManifestTable.createPartitioned(rows, path, "id", "pt", numFiles = 6)
      val m = ManifestTable.readManifest(spark, path)
      val byPart = m.entries.groupBy(_.extra("pt")._1)
      m.entries.foreach { e =>
        val (mn, mx) = e.extra("pt")
        assert(mn == mx, s"range-split broke purity: ${e.relPath}")
      }
      assert(byPart("big").size > 1,
        s"the 500-row partition stayed a single file — the range split " +
        s"did not parallelize the write (files: ${byPart("big").size})")
      // within a partition, files carry disjoint key ranges (tight
      // merge touch-sets — the point of range over hash splitting)
      byPart.values.foreach { es =>
        val ranges = es.map(e => (e.min.get.toLong, e.max.get.toLong))
          .sortBy(_._1)
        ranges.zip(ranges.tail).foreach { case ((_, aMax), (bMin, _)) =>
          assert(aMax < bMin,
            s"overlapping key ranges within a partition: $ranges")
        }
      }
      assert(content(ManifestTable.read(spark, path)) == content(rows))
      // the partition ops are file-count-agnostic
      val st = ManifestTable.deletePartitions(spark, path, Seq("small"))
      assert(st.filesRewritten == 0 && st.filesWritten == 0)
      assert(content(ManifestTable.read(spark, path)) ==
        content(rows.filter(col("pt") === "big")))
    } finally cleanup(path)
  }

  test("compactPartitions rewrites ONLY the selected partitions: " +
    "content unchanged, other partitions' files carried verbatim, " +
    "unknown values burn no version") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(), path, "id", "pt")
      // fragment p1 with several small merges
      ManifestTable.merge(spark, path,
        Seq((1L, "p1", "u1")).toDF("id", "pt", "payload"))
      ManifestTable.merge(spark, path,
        Seq((400L, "p1", "n1")).toDF("id", "pt", "payload"))
      val before = ManifestTable.readManifest(spark, path)
      val p1Before = before.entries.filter(_.extra("pt")._1 == "p1")
      val othersBefore = before.entries.filterNot(_.extra("pt")._1 == "p1")
        .map(_.relPath).toSet
      assert(p1Before.size > 1, "fixture must fragment p1")

      val st = ManifestTable.compactPartitions(spark, path, Seq("p1"))
      assert(st.filesRewritten == p1Before.size,
        s"must rewrite exactly p1's old files, got $st")
      val after = ManifestTable.readManifest(spark, path)
      val p1After = after.entries.filter(_.extra("pt")._1 == "p1")
      assert(p1After.size == 1,
        s"p1 should compact to one file, got ${p1After.size}")
      assert(after.entries.filterNot(_.extra("pt")._1 == "p1")
        .map(_.relPath).toSet == othersBefore,
        "untouched partitions must be carried by reference")
      val expect = content(base()) - ((1L, "p1", "v_1")) +
        ((1L, "p1", "u1")) + ((400L, "p1", "n1"))
      assert(content(ManifestTable.read(spark, path)) == expect)
      // compaction preserves purity and the table stays operable
      p1After.foreach { e =>
        val (mn, mx) = e.extra("pt"); assert(mn == mx) }

      // unknown value: no version burned
      val v = after.version
      val st2 = ManifestTable.compactPartitions(spark, path, Seq("nope"))
      assert(st2.version == v && st2.filesRewritten == 0 &&
        st2.filesWritten == 0)
      assert(ManifestTable.latestVersion(spark, path).contains(v))
    } finally cleanup(path)
  }

  test("refusals: null partition values, non-exact partition type, " +
    "partCol == keyCol, partition ops on an unpartitioned table") {
    val path = tmp()
    try {
      val withNull = Seq((1L, "p0", "a"), (2L, null, "b"))
        .toDF("id", "pt", "payload")
      val e1 = intercept[IllegalStateException] {
        ManifestTable.createPartitioned(withNull, path, "id", "pt")
      }
      assert(e1.getMessage.toLowerCase.contains("null"))
      val e2 = intercept[IllegalArgumentException] {
        ManifestTable.createPartitioned(
          Seq((1L, 0.5, "a")).toDF("id", "pt", "payload"),
          path, "id", "pt")
      }
      assert(e2.getMessage.contains("partition column"))
      val e3 = intercept[IllegalArgumentException] {
        ManifestTable.createPartitioned(base(), path, "id", "id")
      }
      assert(e3.getMessage.contains("differ"))
      // plain table: partition ops must refuse, not misbehave
      ManifestTable.create(base(), path, "id", numFiles = 2)
      val e4 = intercept[IllegalStateException] {
        ManifestTable.deletePartitions(spark, path, Seq("p0"))
      }
      assert(e4.getMessage.contains("not a partitioned table"))
      // and a merge carrying a null partition value into a PARTITIONED
      // table is refused at commit time (purity would break silently)
      ManifestTable.createPartitioned(base(30), path, "id", "pt")
      val e5 = intercept[IllegalStateException] {
        ManifestTable.merge(spark, path,
          Seq((1L, null: String, "x")).toDF("id", "pt", "payload"))
      }
      assert(e5.getMessage.toLowerCase.contains("null"))
    } finally cleanup(path)
  }

  test("retention sweeps the nested partition layout: dropped partition's " +
    "files are gone once out of the window") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(base(30), path, "id", "pt")
      val dropped = ManifestTable.readManifest(spark, path).entries
        .filter(_.extra("pt")._1 == "p1").map(_.relPath)
      assert(dropped.nonEmpty)
      ManifestTable.deletePartitions(spark, path, Seq("p1"))       // v2
      ManifestTable.merge(spark, path,
        Seq((0L, "p0", "x")).toDF("id", "pt", "payload"))          // v3: v1 retired
      // age the now-unreferenced files past the orphan grace, then vacuum
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      dropped.foreach { rel =>
        val p = new org.apache.hadoop.fs.Path(s"$path/$rel")
        fs.setTimes(p, System.currentTimeMillis - 24L * 3600 * 1000, -1)
      }
      ManifestTable.vacuum(spark, path)
      dropped.foreach { rel =>
        assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/$rel")),
          s"retired partition file $rel must be swept")
      }
      assert(content(ManifestTable.read(spark, path)) ==
        content(base(30)).filterNot(_._2 == "p1") - ((0L, "p0", "v_0")) +
          ((0L, "p0", "x")))
    } finally cleanup(path)
  }

  test("partition values with spaces round-trip (the writer leaves the " +
    "space literal on disk while _metadata.file_path URL-encodes it)") {
    val path = tmp()
    try {
      val df = (0 until 60).map(i =>
        (i.toLong, if (i % 2 == 0) "NOT SPECIFIED" else "4-LOW", s"v_$i"))
        .toDF("id", "pt", "payload")
      ManifestTable.createPartitioned(df, path, "id", "pt")
      assert(content(ManifestTable.read(spark, path)) == content(df))
      assert(ManifestTable.readPartitions(spark, path, Seq("NOT SPECIFIED"))
        .count() == 30L)
      val st = ManifestTable.deletePartitions(spark, path, Seq("NOT SPECIFIED"))
      assert(st.filesWritten == 0)
      assert(content(ManifestTable.read(spark, path)) ==
        content(df).filter(_._2 == "4-LOW"))
    } finally cleanup(path)
  }

  test("integral partition values address correctly (string round-trip)") {
    val path = tmp()
    try {
      val df = (0 until 90).map(i => (i.toLong, i % 3, s"v_$i"))
        .toDF("id", "pt", "payload")
      ManifestTable.createPartitioned(df, path, "id", "pt")
      // Seq(1) addresses the pt=1 partition through String.valueOf
      val st = ManifestTable.deletePartitions(spark, path, Seq(1))
      assert(st.filesWritten == 0)
      assert(ManifestTable.read(spark, path)
        .select("pt").distinct().as[Int].collect().toSet == Set(0, 2))
    } finally cleanup(path)
  }
}
