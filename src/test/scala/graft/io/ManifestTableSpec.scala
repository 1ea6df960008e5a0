package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The file-list-manifest table: copy-on-write merge must rewrite ONLY the
  * files whose key range the batch touches (that is the entire point —
  * "mutate 100 TB without rewriting 100 TB"), commits must be atomic and
  * crash-orphans invisible, and retention must keep exactly one
  * superseded version readable. */
class ManifestTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mtab").toString + "/t"

  private def base(n: Int = 1000): DataFrame =
    (0 until n).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")

  private def content(df: DataFrame): Set[(Long, String, Int)] =
    df.select("id", "name", "grp").as[(Long, String, Int)].collect().toSet

  test("create + read round-trips; files carry disjoint sorted key ranges") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      assert(content(ManifestTable.read(spark, path)) == content(base()))
      val m = ManifestTable.readManifest(spark, path)
      assert(m.version == 1L && m.keyCol == "id")
      assert(m.entries.size == 8 && m.entries.map(_.rows).sum == 1000L)
      // per-file ranges must be pairwise disjoint (that is what makes the
      // touch-set computation tight)
      val ranges = m.entries.map(e => (e.min.get.toLong, e.max.get.toLong))
        .sortBy(_._1)
      ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
        assert(hi < lo, s"overlapping file ranges: $ranges")
      case _ => }
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("merge rewrites ONLY touched files; untouched entries carried by " +
    "reference with identical file paths") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      val before = ManifestTable.readManifest(spark, path)
      // a key-local batch: updates 10 keys inside [100, 109] + one insert
      // far beyond every range
      val updates = ((100L to 109L).map(i => (i, s"upd_$i", 99)) :+
        ((5000L, "ins_5000", 99))).toDF("id", "name", "grp")
      val st = ManifestTable.merge(spark, path, updates)

      // expected touch set straight from the manifest intervals (range
      // partitioner boundaries are sampled, so the batch may straddle a
      // file boundary — but never more than two files for 10 contiguous
      // keys out of 1000)
      val expectTouched = before.entries.count(e =>
        e.min.get.toLong <= 109L && e.max.get.toLong >= 100L)
      assert(st.filesBefore == 8)
      assert(st.filesRewritten == expectTouched && expectTouched <= 2,
        s"a 10-key contiguous batch must touch only the covering files, " +
        s"got $st (expected $expectTouched)")
      assert(st.filesCarried == 8 - expectTouched)
      // carried entries are literally the same files (zero bytes moved)
      val after = ManifestTable.readManifest(spark, path)
      val carried = after.entries.map(_.relPath).toSet
        .intersect(before.entries.map(_.relPath).toSet)
      assert(carried.size == 8 - expectTouched)

      val expect = content(base()).filterNot(r => r._1 >= 100 && r._1 <= 109) ++
        (100L to 109L).map(i => (i, s"upd_$i", 99)) + ((5000L, "ins_5000", 99))
      assert(content(ManifestTable.read(spark, path)) == expect)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("pure insert beyond every file range touches zero files") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      val st = ManifestTable.merge(spark, path,
        Seq((9000L, "new", 1), (9001L, "new2", 2)).toDF("id", "name", "grp"))
      assert(st.filesRewritten == 0 && st.filesCarried == 4 &&
        st.filesWritten == 1)
      assert(ManifestTable.read(spark, path).count() == 1002L)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("deleteKeys removes rows copy-on-write; delete-all leaves a " +
    "readable empty table") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 4)
      val expectTouched = ManifestTable.readManifest(spark, path).entries
        .count(e => e.min.get.toLong <= 19L && e.max.get.toLong >= 10L)
      val st = ManifestTable.deleteKeys(spark, path,
        (10L to 19L).toDF("id"))
      assert(st.filesRewritten == expectTouched && expectTouched <= 2 &&
        st.filesCarried == 4 - expectTouched)
      assert(content(ManifestTable.read(spark, path)) ==
        content(base(100)).filterNot(r => r._1 >= 10 && r._1 <= 19))

      ManifestTable.deleteKeys(spark, path, (0L until 100L).toDF("id"))
      val empty = ManifestTable.read(spark, path)
      assert(empty.count() == 0L)
      assert(empty.schema.fieldNames.toSeq == Seq("id", "name", "grp"),
        "empty table must keep its schema (from the manifest)")
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("retention: previous version stays readable for one cycle " +
    "(time travel), older versions are retired with their files") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2)
      val v1 = content(ManifestTable.readAt(spark, path, 1))
      ManifestTable.merge(spark, path,
        Seq((0L, "a", 0)).toDF("id", "name", "grp"))            // v2
      assert(content(ManifestTable.readAt(spark, path, 1)) == v1,
        "superseded version must stay readable for one cycle")
      ManifestTable.merge(spark, path,
        Seq((1L, "b", 0)).toDF("id", "name", "grp"))            // v3
      // v1's manifest is retired; only v2 (previous) and v3 (current) live
      intercept[java.io.FileNotFoundException] {
        ManifestTable.readManifestAt(spark, path, 1)
      }
      assert(ManifestTable.readAt(spark, path, 2).count() == 100L)
      assert(ManifestTable.latestVersion(spark, path).contains(3L))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("crash orphan (txn dir without manifest) is invisible and swept " +
    "by the next successful commit's retention") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2)
      // simulate a crashed transaction: data written, no manifest —
      // backdated past the orphan grace period (a FRESH unreferenced
      // file may belong to an in-flight optimistic committer and must
      // survive the sweep; only aged orphans are collected)
      val orphan = java.nio.file.Paths.get(s"$path/data/txn-2")
      java.nio.file.Files.createDirectories(orphan)
      val orphanFile = orphan.resolve("part-zzz.parquet")
      java.nio.file.Files.write(orphanFile, Array[Byte](1, 2, 3))
      java.nio.file.Files.setLastModifiedTime(orphanFile,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis - 24L * 3600 * 1000))
      assert(ManifestTable.read(spark, path).count() == 100L,
        "reader must see only manifest-listed files")
      // the retried transaction overwrites the orphan dir and commits
      val st = ManifestTable.merge(spark, path,
        Seq((0L, "x", 0)).toDF("id", "name", "grp"))
      assert(st.version == 2L)
      assert(ManifestTable.read(spark, path).count() == 100L)
      assert(!java.nio.file.Files.exists(orphanFile),
        "aged orphan bytes must be gone after the successful commit")
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("concurrent second writer loses loudly at the commit point") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2)
      // both writers read version 1 and race to commit version 2: the
      // second rename must fail the atomic claim, not overwrite
      val m = ManifestTable.readManifest(spark, path)
      ManifestTable.writeManifest(spark, path, 2L, m.keyCol, m.keyType,
        m.schema, m.statsCols, m.entries,
        constraints = Seq.empty, colMap = Seq.empty, retiredPhys = Seq.empty) // writer A wins
      val e = intercept[IllegalStateException] {
        ManifestTable.writeManifest(spark, path, 2L, m.keyCol, m.keyType,
          m.schema, m.statsCols, m.entries,
          constraints = Seq.empty, colMap = Seq.empty, retiredPhys = Seq.empty) // writer B must lose loudly
      }
      assert(e.getMessage.contains("concurrent commit"))
      // and the table is still fully readable at A's commit
      assert(ManifestTable.read(spark, path).count() == 100L)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("null merge keys are rejected loudly at write time") {
    val path = tmp()
    val withNull = Seq((Some(1L), "a", 0), (None, "b", 1))
      .toDF("id", "name", "grp")
    try {
      val e = intercept[Exception] {
        ManifestTable.create(withNull, path, "id", numFiles = 1)
      }
      assert(e.getMessage.contains("null merge key"))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("non-round-trippable merge-key types are refused at create time " +
    "(double NaN / binary non-UTF8 would silently corrupt merges)") {
    val path = tmp()
    try {
      val dbl = Seq((1.5, "a"), (Double.NaN, "b")).toDF("k", "v")
      val e = intercept[IllegalArgumentException] {
        ManifestTable.create(dbl, path, "k", numFiles = 1)
      }
      assert(e.getMessage.contains("integral or string"))
      val bin = Seq((Array[Byte](1, 2), "a")).toDF("k", "v")
      intercept[IllegalArgumentException] {
        ManifestTable.create(bin, path, "k", numFiles = 1)
      }
      intercept[IllegalArgumentException] {
        ManifestTable.createZOrdered(
          Seq((1.5, 1L, 2L)).toDF("k", "a", "b"), path, "k", 1, "a", "b")
      }
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("an upsert batch wider than the table schema is refused loudly " +
    "(direct merge callers get the same guard as applyChanges feeds)") {
    val path = tmp()
    try {
      ManifestTable.create(base(20), path, "id", numFiles = 1)
      val wide = Seq((3L, "x", 1, 99L)).toDF("id", "name", "grp", "extra")
      val e = intercept[IllegalArgumentException] {
        ManifestTable.merge(spark, path, wide)
      }
      assert(e.getMessage.contains("evolve the table first"))
      // the table is untouched
      assert(ManifestTable.latestVersion(spark, path).contains(1L))
      assert(content(ManifestTable.read(spark, path)) == content(base(20)))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("configurable retention: keepVersions=3 gives two-hop time " +
    "travel and a two-commit consumer lag window; setRetention " +
    "narrowing sweeps on the next pass") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        keepVersions = 3)
      assert(ManifestTable.readManifest(spark, path).retain == 3)
      val v1 = content(ManifestTable.readAt(spark, path, 1))
      ManifestTable.merge(spark, path,
        Seq((0L, "a2", 0)).toDF("id", "name", "grp"))            // v2
      ManifestTable.merge(spark, path,
        Seq((1L, "a3", 0)).toDF("id", "name", "grp"))            // v3
      // two hops back: v1 still fully readable
      assert(content(ManifestTable.readAt(spark, path, 1)) == v1,
        "keepVersions=3 must keep two superseded versions readable")
      // a consumer lagging TWO commits still syncs (diff spans v1→v3)
      val cdf = ManifestTable.changesBetween(spark, path, 1L, 3L)
        .as[(String, Long, String, Int)].collect().toSet
      assert(cdf == Set(("update_pre", 0L, "name_0", 0),
        ("update_post", 0L, "a2", 0),
        ("update_pre", 1L, "name_1", 1), ("update_post", 1L, "a3", 0)))
      ManifestTable.merge(spark, path,
        Seq((2L, "a4", 0)).toDF("id", "name", "grp"))            // v4
      // window slid: v1 retired, v2 still in
      intercept[java.io.FileNotFoundException] {
        ManifestTable.readManifestAt(spark, path, 1)
      }
      assert(ManifestTable.readAt(spark, path, 2).count() == 100L)
      // retain survives every commit kind
      ManifestTable.compactTable(spark, path, numFiles = 2)      // v5
      assert(ManifestTable.readManifest(spark, path).retain == 3)
      assert(ManifestTable.readAt(spark, path, 3).count() == 100L)
      // narrow back to 2: the sweep keeps only v5 + the v6 metadata
      // commit; v4 and older retire immediately
      ManifestTable.setRetention(spark, path, 2)                 // v6
      assert(ManifestTable.readManifest(spark, path).retain == 2)
      intercept[java.io.FileNotFoundException] {
        ManifestTable.readManifestAt(spark, path, 4)
      }
      assert(ManifestTable.readAt(spark, path, 5).count() == 100L)
      // a window below 2 is refused (changesBetween needs both sides)
      intercept[IllegalArgumentException] {
        ManifestTable.setRetention(spark, path, 1)
      }
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("mergeInto: conditional clauses apply first-match-wins — subset " +
    "update / delete / carry-unchanged / insert, one atomic commit, " +
    "touch-set bounded") {
    import ManifestTable.{WhenMatched, UpdateSet, DeleteMatched}
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      // source: keys 100..109 with a delta column (extra, never written);
      // + one unmatched key
      val src = ((100L to 109L).map(i => (i, s"src_$i", 7, i * 10)) :+
        ((5000L, "ins_5000", 7, 0L)))
        .toDF("id", "name", "grp", "delta")
      val st = ManifestTable.mergeInto(spark, path, src, Seq(
        // delta > 1050 → delete (keys 106..109)
        WhenMatched(Some(col("s.delta") > 1050L), DeleteMatched),
        // even target grp → bump ONLY grp by delta/100; name kept
        WhenMatched(Some(col("t.grp") % 2 === 0),
          UpdateSet(Map("grp" -> (col("t.grp") + col("s.delta") / 100L)
            .cast("int")))),
        // a later always-true clause must NOT shadow the earlier ones
        WhenMatched(None, UpdateSet(Map("name" -> col("s.name"))))))
      assert(st.filesRewritten <= 2 && st.filesCarried >= 6,
        s"key-local conditional merge must stay touch-set bounded: $st")
      val got = content(ManifestTable.read(spark, path))
      // deleted: 106..109 gone
      (106L to 109L).foreach(i => assert(!got.exists(_._1 == i)))
      // 100..105: grp%7 — even-grp rows got grp bumped (name kept),
      // odd-grp rows fell to the catch-all name update (grp kept)
      (100L to 105L).foreach { i =>
        val g = (i % 7).toInt
        if (g % 2 == 0)
          assert(got.contains((i, s"name_$i", g + (i * 10 / 100).toInt)),
            s"even-grp key $i must take the subset update")
        else assert(got.contains((i, s"src_$i", g)),
          s"odd-grp key $i must take the catch-all name update")
      }
      // unmatched source key inserted; untouched target rows intact
      assert(got.contains((5000L, "ins_5000", 7)))
      assert(got.contains((500L, "name_500", (500 % 7))))
      assert(got.size == 1000 - 4 + 1)

      // insertUnmatched = false: the unmatched key is ignored
      val st2 = ManifestTable.mergeInto(spark, path,
        Seq((6000L, "never", 1, 0L)).toDF("id", "name", "grp", "delta"),
        Seq(WhenMatched(None, UpdateSet(Map("grp" -> lit(9))))),
        insertUnmatched = false)
      assert(!content(ManifestTable.read(spark, path)).exists(_._1 == 6000L))
      assert(st2.filesRewritten == 0)

      // refusals: key update, unknown column, missing insert schema
      intercept[IllegalArgumentException] {
        ManifestTable.mergeInto(spark, path, src,
          Seq(WhenMatched(None, UpdateSet(Map("id" -> lit(1L))))))
      }
      intercept[IllegalArgumentException] {
        ManifestTable.mergeInto(spark, path, src,
          Seq(WhenMatched(None, UpdateSet(Map("nope" -> lit(1L))))))
      }
      intercept[IllegalArgumentException] {
        ManifestTable.mergeInto(spark, path,
          Seq((1L, 5L)).toDF("id", "delta"),
          Seq(WhenMatched(None, DeleteMatched)), insertUnmatched = true)
      }
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("history lists retained versions with op + counts + commit time; " +
    "readAsOfTime resolves wall-clock snapshots inside the window and " +
    "refuses retired ones loudly") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        keepVersions = 3)
      Thread.sleep(15); val t1 = System.currentTimeMillis; Thread.sleep(15)
      ManifestTable.merge(spark, path,
        Seq((0L, "v2", 9), (500L, "ins", 9)).toDF("id", "name", "grp"))
      Thread.sleep(15); val t2 = System.currentTimeMillis; Thread.sleep(15)
      ManifestTable.deleteKeys(spark, path, Seq(1L, 2L).toDF("id"))

      val h = ManifestTable.history(spark, path)
        .select("version", "op", "n_rows")
        .as[(Long, String, Long)].collect().toSeq
      assert(h == Seq((3L, "delete", 99L), (2L, "merge", 101L),
        (1L, "create", 100L)), s"history mismatch: $h")
      val ts = ManifestTable.history(spark, path)
        .select("commit_ts").as[Long].collect().toSeq
      assert(ts == ts.sorted.reverse && ts.forall(_ > 0L))

      assert(ManifestTable.readAsOfTime(spark, path, t1).count() == 100L,
        "t1 predates the merge: must serve v1")
      assert(ManifestTable.readAsOfTime(spark, path, t2).count() == 101L,
        "t2 is between merge and delete: must serve v2")
      assert(ManifestTable.readAsOfTime(spark, path,
        System.currentTimeMillis).count() == 99L)
      val e = intercept[IllegalStateException] {
        ManifestTable.readAsOfTime(spark, path, t1 - 100000L)
      }
      assert(e.getMessage.contains("widen keepVersions"))
      // a typo'd path is loud, not an empty history
      intercept[IllegalArgumentException] {
        ManifestTable.history(spark, s"$path-nonexistent")
      }

      // the window slides: after one more commit v1 is retired, so t1
      // now resolves nothing
      ManifestTable.merge(spark, path,
        Seq((3L, "v4", 9)).toDF("id", "name", "grp"))
      intercept[IllegalStateException] {
        ManifestTable.readAsOfTime(spark, path, t1)
      }
      assert(ManifestTable.readAsOfTime(spark, path,
        System.currentTimeMillis).count() == 99L)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("restore across an additive evolution keeps the WIDE schema " +
    "(evolved consumers converge, no narrowed feed) and brings back " +
    "the restored version's tag with its data") {
    val root = java.nio.file.Files.createTempDirectory("graft_restev")
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(base(40), src, "id", numFiles = 2,
        keepVersions = 5)
      graft.jobs.TableMirrorJob.run(spark, src, dst)          // tag 1
      ManifestTable.evolveSchema(spark, src,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.LongType))))           // v2
      ManifestTable.merge(spark, src,
        Seq((3L, "x", 9, 777L)).toDF("id", "name", "grp", "score")) // v3
      ManifestTable.evolveSchema(spark, dst,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.LongType))))
      graft.jobs.TableMirrorJob.run(spark, src, dst)          // tag 3
      // roll the source back to PRE-evolution v1: the schema must stay
      // wide (score, all null) — a narrowed feed would wedge the
      // evolved mirror
      ManifestTable.restoreVersion(spark, src, 1L)            // v4
      val m4 = ManifestTable.readManifest(spark, src)
      assert(m4.schema.fieldNames.contains("score"),
        "restore must keep the evolved (wide) schema")
      assert(ManifestTable.read(spark, src)
        .filter(col("score").isNotNull).count() == 0L)
      graft.jobs.TableMirrorJob.run(spark, src, dst)          // tag 4
      assert(ManifestTable.read(spark, dst)
        .filter(col("score").isNotNull).count() == 0L,
        "the evolved mirror must converge through the rollback")
      assert(ManifestTable.read(spark, dst).count() == 40L)

      // tag rolls back WITH the data (they were atomic at that version)
      val tpath = s"$root/tagged"
      ManifestTable.create(base(10), tpath, "id", numFiles = 1,
        tag = Some("10"), keepVersions = 3)
      ManifestTable.setTagOnly(spark, tpath, "20")            // v2
      ManifestTable.restoreVersion(spark, tpath, 1L)          // v3
      assert(ManifestTable.readTag(spark, tpath).contains("10"),
        "the restored version's tag must come back with its data")
    } finally Fs.deleteRecursively(root)
  }

  test("vacuum sweeps aged orphans without a commit; fresh unreferenced " +
    "files always survive (no force flag)") {
    val path = tmp()
    try {
      ManifestTable.create(base(50), path, "id", numFiles = 2)
      // an aged crash orphan and a FRESH one (an in-flight committer's)
      val txn = java.nio.file.Paths.get(s"$path/data/txn-9-dead")
      java.nio.file.Files.createDirectories(txn)
      val aged = txn.resolve("part-old.parquet")
      val fresh = txn.resolve("part-new.parquet")
      java.nio.file.Files.write(aged, Array[Byte](1))
      java.nio.file.Files.write(fresh, Array[Byte](2))
      java.nio.file.Files.setLastModifiedTime(aged,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis - 24L * 3600 * 1000))
      val v = ManifestTable.latestVersion(spark, path)
      ManifestTable.vacuum(spark, path)
      assert(ManifestTable.latestVersion(spark, path) == v,
        "vacuum must not burn a version")
      assert(!java.nio.file.Files.exists(aged), "aged orphan swept")
      assert(java.nio.file.Files.exists(fresh),
        "fresh unreferenced file must survive the grace period")
      assert(ManifestTable.read(spark, path).count() == 50L)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("restoreVersion rolls back as a metadata-only commit: content " +
    "returns, history records it, the CDF window emits exactly the " +
    "undone rows, and a consumer converges through the rollback") {
    val root = java.nio.file.Files.createTempDirectory("graft_restore")
    val path = s"$root/t"; val dst = s"$root/mirror"
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        keepVersions = 3)
      // a mirror synced BEFORE the bad commit
      graft.jobs.TableMirrorJob.run(spark, path, dst)
      // the bad commit: update + insert
      ManifestTable.merge(spark, path,
        Seq((7L, "BAD", 9), (900L, "BADINS", 9)).toDF("id", "name", "grp"))
      graft.jobs.TableMirrorJob.run(spark, path, dst)
      assert(content(ManifestTable.read(spark, dst))
        .exists(_._2 == "BAD"))

      ManifestTable.restoreVersion(spark, path, 1L) // v3
      assert(content(ManifestTable.read(spark, path)) == content(base(100)),
        "rollback must restore v1")
      // metadata-only: the restore re-references v1's files
      val m1e = ManifestTable.readManifestAt(spark, path, 1L)
        .entries.map(_.relPath).toSet
      val m3e = ManifestTable.readManifest(spark, path)
        .entries.map(_.relPath).toSet
      assert(m3e == m1e, "restore must re-point at the old files")
      // history records the rollback
      val ops = ManifestTable.history(spark, path)
        .select("version", "op").as[(Long, String)].collect().toMap
      assert(ops(3L) == "restore(v1)" && ops(2L) == "merge")
      // the CDF window across the rollback is exactly the undo
      val undo = ManifestTable.changesBetween(spark, path, 2L, 3L)
        .as[(String, Long, String, Int)].collect().toSet
      assert(undo == Set(
        ("update_pre", 7L, "BAD", 9), ("update_post", 7L, "name_7", 0),
        ("delete", 900L, "BADINS", 9)), s"got $undo")
      // the mirror converges through the rollback like any commit
      graft.jobs.TableMirrorJob.run(spark, path, dst)
      assert(content(ManifestTable.read(spark, dst)) ==
        content(ManifestTable.read(spark, path)))
      // refusals: non-past target; retired target
      intercept[IllegalArgumentException] {
        ManifestTable.restoreVersion(spark, path, 3L)
      }
      ManifestTable.merge(spark, path,
        Seq((8L, "x", 1)).toDF("id", "name", "grp"))         // v4
      ManifestTable.merge(spark, path,
        Seq((9L, "y", 1)).toDF("id", "name", "grp"))         // v5
      intercept[java.io.FileNotFoundException] {
        ManifestTable.restoreVersion(spark, path, 1L)        // retired
      }
    } finally Fs.deleteRecursively(root)
  }

  test("string keys work end-to-end (ordering is Spark's, via the " +
    "cast-back range join)") {
    val path = tmp()
    try {
      val df = ('a' to 'z').map(c => (s"k_$c$c", c.toInt)).toDF("k", "v")
      ManifestTable.create(df, path, "k", numFiles = 4)
      val st = ManifestTable.merge(spark, path,
        Seq(("k_cc", 999), ("k_zz", 998)).toDF("k", "v"))
      assert(st.filesRewritten >= 1 && st.filesRewritten <= 2 &&
        st.filesCarried == st.filesBefore - st.filesRewritten)
      val got = ManifestTable.read(spark, path).as[(String, Int)]
        .collect().toMap
      assert(got("k_cc") == 999 && got("k_zz") == 998 && got("k_aa") == 'a'.toInt)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("changesBetween emits the exact CDF (update_pre/post, insert, " +
    "delete) and a compaction emits ZERO changes") {
    val path = tmp()
    try {
      ManifestTable.create(base(200), path, "id", numFiles = 4)
      // v2: update keys 5..9, insert 900, delete nothing
      ManifestTable.merge(spark, path,
        ((5L to 9L).map(i => (i, s"upd_$i", 42)) :+ ((900L, "new", 7)))
          .toDF("id", "name", "grp"))
      val cdf = ManifestTable.changesBetween(spark, path, 1L, 2L)
        .as[(String, Long, String, Int)].collect().toSet
      val expect: Set[(String, Long, String, Int)] =
        (5L to 9L).map(i => ("update_pre", i, s"name_$i", (i % 7).toInt)).toSet ++
        (5L to 9L).map(i => ("update_post", i, s"upd_$i", 42)) +
        (("insert", 900L, "new", 7))
      assert(cdf == expect,
        s"carried-unchanged rows must cancel; got ${cdf.diff(expect)} / " +
        s"missing ${expect.diff(cdf)}")

      // v3: delete two keys → pure deletes in the feed
      ManifestTable.deleteKeys(spark, path, Seq(0L, 1L).toDF("id"))
      val cdf23 = ManifestTable.changesBetween(spark, path, 2L, 3L)
        .as[(String, Long, String, Int)].collect().toSet
      assert(cdf23 == Set(("delete", 0L, "name_0", 0),
        ("delete", 1L, "name_1", 1)))

      // v4: compaction moves every row to new files, changes nothing
      ManifestTable.compactTable(spark, path, numFiles = 2)
      assert(ManifestTable.changesBetween(spark, path, 3L, 4L).count() == 0L,
        "a compaction is not a data change")
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("mirror job: bootstrap, incremental syncs ∝ changes, idempotent " +
    "replay, zero-change sync after source compaction, loud lag failure") {
    val root = java.nio.file.Files.createTempDirectory("graft_mirror")
    val src = s"$root/src"; val dst = s"$root/dst"
    def srcEqualsDst(): Unit =
      assert(content(ManifestTable.read(spark, src)) ==
        content(ManifestTable.read(spark, dst)))
    try {
      ManifestTable.create(base(300), src, "id", numFiles = 4)
      // bootstrap: full copy + the source version as the dst's sync tag
      assert(graft.jobs.TableMirrorJob.run(spark, src, dst)
        .contains((0L, 1L)))
      srcEqualsDst()
      assert(ManifestTable.readTag(spark, dst).contains("1"))
      // merge on source → one incremental sync
      ManifestTable.merge(spark, src,
        Seq((7L, "x", 9), (999L, "ins", 9)).toDF("id", "name", "grp"))
      assert(graft.jobs.TableMirrorJob.run(spark, src, dst)
        .contains((1L, 2L)))
      srcEqualsDst()
      // crash-replay: re-apply the same feed as if the sync's commit had
      // been lost — replace semantics converge (the tag-based design
      // makes this unreachable from syncMirror itself, but applyChanges
      // must still absorb a manual re-apply)
      ManifestTable.applyChanges(spark, dst,
        ManifestTable.changesBetween(spark, src, 1L, 2L))
      srcEqualsDst()
      // delete on source → sync
      ManifestTable.deleteKeys(spark, src, Seq(3L, 4L).toDF("id"))
      assert(graft.jobs.TableMirrorJob.run(spark, src, dst)
        .contains((2L, 3L)))
      srcEqualsDst()
      // caught up → None
      assert(graft.jobs.TableMirrorJob.run(spark, src, dst).isEmpty)
      // source compaction → the sync window carries no changes: the tag
      // must advance (else the empty diff recomputes forever) but no
      // data file of the mirror may be rewritten
      ManifestTable.compactTable(spark, src, numFiles = 2)
      val dstEntriesBefore = ManifestTable.readManifest(spark, dst).entries
      assert(graft.jobs.TableMirrorJob.run(spark, src, dst)
        .contains((3L, 4L)))
      assert(ManifestTable.readManifest(spark, dst).entries
        == dstEntriesBefore,
        "a compaction-only sync must not rewrite any mirror data file")
      assert(ManifestTable.readTag(spark, dst).contains("4"))
      srcEqualsDst()
      // a dst that exists without a sync tag is refused, not silently
      // re-bootstrapped over
      val foreign = s"$root/foreign"
      ManifestTable.create(base(10), foreign, "id", numFiles = 1)
      val e0 = intercept[IllegalStateException] {
        graft.jobs.TableMirrorJob.run(spark, src, foreign)
      }
      assert(e0.getMessage.contains("no sync tag"))
      // lag past retention: two more source commits without syncing →
      // the tag's manifest is retired, sync must fail loudly
      ManifestTable.merge(spark, src, Seq((8L, "y", 1)).toDF("id", "name", "grp"))
      ManifestTable.merge(spark, src, Seq((9L, "z", 2)).toDF("id", "name", "grp"))
      val e = intercept[IllegalStateException] {
        ManifestTable.syncMirror(spark, src, dst)
      }
      assert(e.getMessage.contains("re-bootstrap"))
    } finally Fs.deleteRecursively(root)
  }

  test("secondary stats columns: recorded at write time, preserved " +
    "through merges, and prunedRead reads only intersecting files") {
    val path = tmp()
    try {
      // id-sorted layout; ts correlates with id, so per-file ts ranges
      // are narrow — the shape stats-based skipping exists for
      val df = (0L to 999L).map(i => (i, i * 100L, s"p$i"))
        .toDF("id", "ts", "payload")
      ManifestTable.create(df, path, "id", numFiles = 8,
        statsCols = Seq("ts"))
      val m = ManifestTable.readManifest(spark, path)
      assert(m.statsCols == Seq("ts"))
      assert(m.entries.forall(_.extra.contains("ts")))

      // a narrow ts slice must read a strict subset of the files
      val slice = ManifestTable.prunedRead(spark, path, "ts", 10000L, 19900L)
      assert(slice.inputFiles.length < 8 && slice.inputFiles.nonEmpty,
        s"expected pruning, read ${slice.inputFiles.length} files")
      assert(slice.filter(col("ts").between(10000L, 19900L)).count() == 100L)
      // out-of-range slice reads nothing
      assert(ManifestTable.prunedRead(spark, path, "ts", 900000L, 999999L)
        .inputFiles.isEmpty)
      // key-column pruning works through the same API
      assert(ManifestTable.prunedRead(spark, path, "id", 0L, 50L)
        .inputFiles.length < 8)
      // untracked column fails loudly
      intercept[IllegalArgumentException] {
        ManifestTable.prunedRead(spark, path, "payload", "a", "b")
      }

      // merge preserves stats tracking on the new txn's files
      ManifestTable.merge(spark, path,
        Seq((5L, 123456L, "upd")).toDF("id", "ts", "payload"))
      val m2 = ManifestTable.readManifest(spark, path)
      assert(m2.statsCols == Seq("ts"))
      assert(m2.entries.forall(_.extra.contains("ts")))

      // describe surfaces the inventory with per-column ranges
      val d = ManifestTable.describe(spark, path)
      assert(d.columns.toSeq ==
        Seq("file", "rows", "key_min", "key_max", "ts_min", "ts_max",
          "dv_file", "dv_dead"))
      assert(d.count() == m2.entries.size.toLong)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("additive schema evolution: metadata-only commit, old files read " +
    "NULL for new columns, later merges carry them; non-additive refused") {
    val path = tmp()
    try {
      ManifestTable.create(base(50), path, "id", numFiles = 2)
      val entriesBefore = ManifestTable.readManifest(spark, path).entries
      ManifestTable.evolveSchema(spark, path,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.LongType))))
      // no data file touched
      assert(ManifestTable.readManifest(spark, path).entries == entriesBefore)
      // pre-evolution rows read NULL for the new column
      val d = ManifestTable.read(spark, path)
      assert(d.schema.fieldNames.toSeq == Seq("id", "name", "grp", "score"))
      assert(d.filter(col("score").isNotNull).count() == 0L)
      // a later merge carries the new column; old rows stay null
      ManifestTable.merge(spark, path,
        Seq((3L, "x", 9, 777L)).toDF("id", "name", "grp", "score"))
      val got = ManifestTable.read(spark, path)
        .select("id", "score").as[(Long, Option[Long])].collect().toMap
      assert(got(3L).contains(777L) && got(4L).isEmpty)
      // non-additive evolution is refused
      val e = intercept[IllegalArgumentException] {
        ManifestTable.evolveSchema(spark, path,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("name",
              org.apache.spark.sql.types.StringType))))
      }
      assert(e.getMessage.contains("already"))
      // internally-duplicated and empty newCols are refused too (a
      // two-'score' schema would wedge every later read)
      intercept[IllegalArgumentException] {
        ManifestTable.evolveSchema(spark, path,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("z",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("z",
              org.apache.spark.sql.types.StringType))))
      }
      intercept[IllegalArgumentException] {
        ManifestTable.evolveSchema(spark, path,
          org.apache.spark.sql.types.StructType(Nil))
      }

      // the post-evolution feed carries the new column; a mirror that
      // has NOT evolved refuses it loudly instead of silently dropping
      // the column (v2 = evolve commit, v3 = the merge above)
      val feed = ManifestTable.changesBetween(spark, path, 2L, 3L)
      assert(feed.columns.contains("score"))
      val dst = java.nio.file.Files.createTempDirectory("graft_mtev")
        .toString + "/d"
      try {
        ManifestTable.create(base(10), dst, "id", numFiles = 1)
        val e2 = intercept[IllegalArgumentException] {
          ManifestTable.applyChanges(spark, dst, feed)
        }
        assert(e2.getMessage.contains("evolve the destination"))
      } finally Fs.deleteRecursively(
        java.nio.file.Paths.get(dst).getParent)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("the CDF window SPANNING a schema-evolution commit diffs with the " +
    "wider schema instead of failing on mismatched column counts") {
    val path = tmp()
    val viewRoot = java.nio.file.Files.createTempDirectory("graft_mtev2")
    val view = s"$viewRoot/v"
    try {
      ManifestTable.create(base(20), path, "id", numFiles = 1)
      // a consumer bootstrapped BEFORE the evolution (tag = 1)
      assert(graft.jobs.AggViewJob.run(spark, path, view, "grp", "id")
        .contains((0L, 1L)))
      ManifestTable.evolveSchema(spark, path,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.LongType))))
      // v1 (3 cols) → v2 (4 cols), metadata-only: the spanning diff must
      // be EMPTY, not an AnalysisException from a positional exceptAll
      // over different column counts — this is exactly the window an
      // incremental consumer computes right after a source evolution,
      // and a throw here would wedge it forever (tag can never advance)
      assert(ManifestTable.changesBetween(spark, path, 1L, 2L).count() == 0L)
      // the consumer's sync crosses the evolution and advances cleanly
      assert(graft.jobs.AggViewJob.run(spark, path, view, "grp", "id")
        .contains((1L, 2L)))
      assert(ManifestTable.readTag(spark, view).contains("2"))
    } finally {
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
      Fs.deleteRecursively(viewRoot)
    }
  }

  test("Z-ordered layout: manifest stats prune files on EITHER " +
    "dimension; merges still correct; Z compaction restores the curve") {
    val root = java.nio.file.Files.createTempDirectory("graft_mtz")
    val path = s"$root/t"
    try {
      // a 32×32 grid: every (a, b) cell once — under a Morton layout
      // each of the 16 files covers a rectangle, so a narrow slice in
      // EITHER dimension intersects only a strip of files
      val df = (0 until 1024).map(i =>
        (i.toLong, (i % 32).toLong, (i / 32).toLong)).toDF("id", "a", "b")
      ManifestTable.createZOrdered(df, path, "id", numFiles = 16, "a", "b")
      val m = ManifestTable.readManifest(spark, path)
      assert(m.statsCols == Seq("a", "b"))

      val sliceA = ManifestTable.prunedRead(spark, path, "a", 0L, 3L)
      assert(sliceA.inputFiles.length < 16 && sliceA.inputFiles.nonEmpty,
        s"a-slice must prune: ${sliceA.inputFiles.length}/16 files")
      assert(sliceA.filter(col("a") <= 3L).count() == 4L * 32)
      val sliceB = ManifestTable.prunedRead(spark, path, "b", 0L, 3L)
      assert(sliceB.inputFiles.length < 16 && sliceB.inputFiles.nonEmpty,
        s"b-slice must prune: ${sliceB.inputFiles.length}/16 files")
      assert(sliceB.filter(col("b") <= 3L).count() == 4L * 32)

      // copy-on-write merge stays correct on the Z layout (touch set is
      // wider — documented trade)
      ManifestTable.merge(spark, path,
        Seq((5L, 99L, 99L)).toDF("id", "a", "b"))
      assert(ManifestTable.read(spark, path).count() == 1024L)
      assert(ManifestTable.read(spark, path)
        .filter(col("id") === 5L).select("a").as[Long].head() == 99L)

      // Z compaction restores one curve over everything, stats intact
      ManifestTable.compactTableZOrdered(spark, path, 16, "a", "b")
      val m2 = ManifestTable.readManifest(spark, path)
      assert(m2.entries.size == 16 &&
        m2.entries.forall(e => e.extra.contains("a") && e.extra.contains("b")))
      assert(ManifestTable.read(spark, path).count() == 1024L)
    } finally Fs.deleteRecursively(root)
  }

  test("Z migration + layout-aware maintenance: compactTableZOrdered " +
    "adds z stats to a key-sorted table, the layout is recorded, and " +
    "auto-compaction preserves the curve instead of key-sorting it away") {
    val root = java.nio.file.Files.createTempDirectory("graft_mtzm")
    val path = s"$root/t"
    try {
      val df = (0 until 256).map(i =>
        (i.toLong, (i % 16).toLong, (i / 16).toLong)).toDF("id", "a", "b")
      ManifestTable.create(df, path, "id", numFiles = 4) // key-sorted
      assert(ManifestTable.readManifest(spark, path).zCols.isEmpty)
      // migration: the z columns join the tracked stats in the SAME
      // commit, so 2-D pruning works immediately after
      ManifestTable.compactTableZOrdered(spark, path, 8, "a", "b")
      val m = ManifestTable.readManifest(spark, path)
      assert(m.zCols.contains(("a", "b")) && m.statsCols == Seq("a", "b"))
      assert(ManifestTable.prunedRead(spark, path, "a", 0L, 1L)
        .inputFiles.length < 8)
      // pile up files, then the AUTO trigger: dispatch must go through
      // the Z path — layout and z stats survive
      (1 to 3).foreach(i => ManifestTable.merge(spark, path,
        Seq((1000L + i, i.toLong, i.toLong)).toDF("id", "a", "b")))
      assert(ManifestTable.maybeCompactTable(spark, path,
        maxFiles = 8, numFiles = 8))
      val m2 = ManifestTable.readManifest(spark, path)
      assert(m2.zCols.contains(("a", "b")),
        "auto-compaction must not key-sort a Z table")
      assert(m2.entries.forall(e =>
        e.extra.contains("a") && e.extra.contains("b")))
      assert(ManifestTable.read(spark, path).count() == 259L)

      // destructive-create guard: a typo'd column must fail BEFORE the
      // existing table is deleted
      intercept[IllegalArgumentException] {
        ManifestTable.createZOrdered(df, path, "id", 4, "a", "nope")
      }
      assert(ManifestTable.read(spark, path).count() == 259L,
        "failed createZOrdered must not have destroyed the table")
    } finally Fs.deleteRecursively(root)
  }

  test("maybeCompactTable fires on file count and preserves content") {
    val root = java.nio.file.Files.createTempDirectory("graft_mtac")
    val path = s"$root/t"
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2)
      (1 to 4).foreach(i => ManifestTable.merge(spark, path,
        Seq((500L + i, s"n$i", i)).toDF("id", "name", "grp")))
      assert(ManifestTable.readManifest(spark, path).entries.size > 4)
      assert(!ManifestTable.maybeCompactTable(spark, path,
        maxFiles = 100, numFiles = 2), "below threshold: no compaction")
      val before = content(ManifestTable.read(spark, path))
      assert(ManifestTable.maybeCompactTable(spark, path,
        maxFiles = 4, numFiles = 2), "above threshold: compaction fires")
      assert(ManifestTable.readManifest(spark, path).entries.size == 2)
      assert(content(ManifestTable.read(spark, path)) == before)
    } finally Fs.deleteRecursively(root)
  }

  test("compactTable restores disjoint ranges after layered merges, " +
    "preserving content") {
    val path = tmp()
    try {
      ManifestTable.create(base(500), path, "id", numFiles = 4)
      // three scattered merges layer overlapping txn ranges
      (1 to 3).foreach { i =>
        ManifestTable.merge(spark, path,
          Seq((i * 97L, s"m$i", i), (400L + i, s"n$i", i))
            .toDF("id", "name", "grp"))
      }
      val expect = content(ManifestTable.read(spark, path))
      ManifestTable.compactTable(spark, path, numFiles = 4)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.entries.size == 4)
      val ranges = m.entries.map(e => (e.min.get.toLong, e.max.get.toLong))
        .sortBy(_._1)
      ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
        assert(hi < lo, s"compaction must restore disjoint ranges: $ranges")
      case _ => }
      assert(content(ManifestTable.read(spark, path)) == expect)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("compactSmallFiles folds ONLY the fragment mass: big files " +
    "byte-untouched, dv'd files materialized, singleton no-op") {
    val path = tmp()
    try {
      ManifestTable.create(base(1000), path, "id", numFiles = 2)
      // three small insert-only merges fragment the layout
      (1 to 3).foreach { j =>
        ManifestTable.merge(spark, path,
          (0 until 20).map(i => (10000L * j + i, s"ins${j}_$i", j))
            .toDF("id", "name", "grp"))
      }
      val before = ManifestTable.readManifest(spark, path)
      assert(before.entries.size == 5)
      val bigRels = before.entries.filter(_.rows >= 400L).map(_.relPath)
      assert(bigRels.size == 2)
      val want = content(ManifestTable.read(spark, path))

      val st = ManifestTable.compactSmallFiles(spark, path,
        targetRows = 400L)
      assert(st.filesRewritten == 3 && st.filesCarried == 2 &&
        st.filesWritten == 1)
      val m1 = ManifestTable.readManifest(spark, path)
      assert(bigRels.forall(r => m1.entries.exists(_.relPath == r)),
        "big files must be carried by reference")
      assert(content(ManifestTable.read(spark, path)) == want)

      // the folded 60-row file is still < target but now a SINGLETON
      // clean small file: folding it again buys nothing — no-op
      val st2 = ManifestTable.compactSmallFiles(spark, path,
        targetRows = 400L)
      assert(st2.version == st.version && st2.filesRewritten == 0)

      // a deletion vector on a BIG file makes it a candidate: the
      // rewrite materializes the vector
      ManifestTable.deleteKeysDV(spark, path, Seq(5L).toDF("id"))
      val st3 = ManifestTable.compactSmallFiles(spark, path,
        targetRows = 400L)
      assert(st3.filesRewritten == 2) // the dv'd big + the 60-row small
      val m3 = ManifestTable.readManifest(spark, path)
      assert(m3.entries.forall(_.dv.isEmpty))
      assert(content(ManifestTable.read(spark, path)) ==
        (want -- want.filter(_._1 == 5L)))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }
}
