package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion vectors: mutate a manifest table WITHOUT rewriting data
  * files — deletes/upserts mark rows dead in a parquet sidecar and
  * re-point the covering entries, so write cost is ∝ the batch (the 3
  * rows), never the touched files (the 1 GB). The suite pins the three
  * things that make the feature real: (1) the bytes of every
  * pre-existing data file are UNTOUCHED by a dv commit, (2) every
  * reader — read, time travel, CDF, consumers, later copy-on-write
  * merges, compaction — sees exactly the live rows, and (3) the
  * file-scoped anti-join survives the delete→re-insert→consolidation
  * trap where a key is dead in one file and live in another that share
  * a sidecar. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dv").toString + "/t"

  private def base(n: Int = 1000): DataFrame =
    (0 until n).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")

  private def content(df: DataFrame): Set[(Long, String, Int)] =
    df.select("id", "name", "grp").as[(Long, String, Int)].collect().toSet

  /** (relPath → (length, mtime)) of every file under the table root —
    * the byte-identity witness for "dv commits move no data". */
  private def fileState(path: String): Map[String, (Long, Long)] = {
    val root = java.nio.file.Paths.get(path, "data")
    if (!java.nio.file.Files.exists(root)) return Map.empty
    val out = Map.newBuilder[String, (Long, Long)]
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p))
        out += (root.getParent.relativize(p).toString ->
          ((java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)))
    }
    out.result()
  }

  test("deleteKeysDV: zero data files rewritten, read sees live rows, " +
    "stats report the repoint") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      val before = ManifestTable.readManifest(spark, path)
      val bytesBefore = fileState(path)
      val dead = (100L to 109L)
      val st = ManifestTable.deleteKeysDV(spark, path,
        dead.map(Tuple1(_)).toDF("id"))
      assert(st.deadMarked == 10L && st.filesWritten == 0 &&
        st.filesDropped == 0 && st.filesRepointed >= 1)

      // every pre-existing file is byte-identical (same size + mtime);
      // the only additions are the sidecar's files
      val after = fileState(path)
      bytesBefore.foreach { case (rel, sig) =>
        assert(after.get(rel).contains(sig), s"$rel was rewritten") }
      assert((after.keySet -- bytesBefore.keySet).forall(_.contains("-dv")))

      val m = ManifestTable.readManifest(spark, path)
      // same file list, dv refs only on the touched entries, live-row
      // accounting nets out the dead
      assert(m.entries.map(_.relPath).toSet ==
        before.entries.map(_.relPath).toSet)
      assert(m.entries.map(_.rows).sum == 990L)
      assert(m.entries.filter(_.dv.isDefined).map(_.dv.get.dead).sum == 10L)
      assert(content(ManifestTable.read(spark, path)) ==
        content(base().filter(!col("id").isin(dead: _*))))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("upsertDV: matched keys die via the vector, the batch APPENDS — " +
    "no pre-existing byte moves") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      val bytesBefore = fileState(path)
      val updates = ((100L to 109L).map(i => (i, s"upd_$i", 99)) :+
        ((5000L, "ins_5000", 99))).toDF("id", "name", "grp")
      val st = ManifestTable.upsertDV(spark, path, updates)
      assert(st.deadMarked == 10L && st.filesWritten >= 1)

      val after = fileState(path)
      bytesBefore.foreach { case (rel, sig) =>
        assert(after.get(rel).contains(sig), s"$rel was rewritten") }

      val expect = base().filter(!col("id").between(100L, 109L))
        .unionByName(updates)
      assert(content(ManifestTable.read(spark, path)) == content(expect))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("consolidation trap: a key dead in one file and LIVE in another " +
    "sharing the sidecar survives (file-scoped anti-join)") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      // kill 10 in its original file, then re-insert it (appended file C
      // also spans 500, whose original copy dies in ITS file)
      ManifestTable.deleteKeysDV(spark, path, Seq(10L).toDF("id"))
      ManifestTable.upsertDV(spark, path,
        Seq((10L, "re_10", 99), (500L, "re_500", 99))
          .toDF("id", "name", "grp"))
      // now delete {11, 500}: 11 dies in the first file, 500 dies in C —
      // both re-point to ONE sidecar that also carries the first file's
      // consolidated old pair (·,10) while C holds a LIVE physical 10.
      // A key-only anti-join would kill it.
      val st = ManifestTable.deleteKeysDV(spark, path,
        Seq(11L, 500L).toDF("id"))
      assert(st.deadMarked == 2L)
      val got = content(ManifestTable.read(spark, path))
      assert(got.contains((10L, "re_10", 99)), "re-inserted key 10 lost")
      assert(!got.exists(r => r._1 == 11L || r._1 == 500L))
      assert(got == content(
        base().filter(!col("id").isin(10L, 11L, 500L))
          .unionByName(Seq((10L, "re_10", 99)).toDF("id", "name", "grp"))))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("double delete is a no-op: nothing newly dead burns no version") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      val st1 = ManifestTable.deleteKeysDV(spark, path,
        Seq(5L, 6L).toDF("id"))
      val st2 = ManifestTable.deleteKeysDV(spark, path,
        Seq(5L, 6L).toDF("id"))
      assert(st2.version == st1.version && st2.deadMarked == 0L)
      // absent keys are equally a no-op
      val st3 = ManifestTable.deleteKeysDV(spark, path,
        Seq(123456L).toDF("id"))
      assert(st3.version == st1.version && st3.deadMarked == 0L)
      assert(ManifestTable.read(spark, path).count() == 998L)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("a file whose last live row dies is DROPPED from the manifest") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      val m0 = ManifestTable.readManifest(spark, path)
      val victim = m0.entries.head
      val range = victim.min.get.toLong to victim.max.get.toLong
      val st = ManifestTable.deleteKeysDV(spark, path,
        range.map(Tuple1(_)).toDF("id"))
      assert(st.filesDropped == 1)
      val m1 = ManifestTable.readManifest(spark, path)
      assert(m1.entries.size == 3 &&
        !m1.entries.exists(_.relPath == victim.relPath))
      assert(ManifestTable.read(spark, path).count() ==
        1000L - victim.rows)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("CDF: a dv delete emits exactly the dead rows; a dv upsert emits " +
    "update_pre/update_post/insert — the Delta-CDF shape") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4,
        keepVersions = 4)
      ManifestTable.deleteKeysDV(spark, path, Seq(7L, 8L).toDF("id"))
      val feedDel = ManifestTable.changesBetween(spark, path, 1L, 2L)
        .select("_change_type", "id").as[(String, Long)].collect().toSet
      assert(feedDel == Set(("delete", 7L), ("delete", 8L)))

      ManifestTable.upsertDV(spark, path,
        Seq((9L, "upd_9", 99), (7777L, "ins", 99)).toDF("id", "name", "grp"))
      val feedUp = ManifestTable.changesBetween(spark, path, 2L, 3L)
        .select("_change_type", "id").as[(String, Long)].collect().toSet
      assert(feedUp == Set(("update_pre", 9L), ("update_post", 9L),
        ("insert", 7777L)))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("CDF across a RESTORE that rewinds a vector: resurrected rows " +
    "surface as inserts (the fast path's reverse direction)") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        keepVersions = 4)
      ManifestTable.deleteKeysDV(spark, path, Seq(7L, 8L).toDF("id"))
      ManifestTable.restoreVersion(spark, path, 1L)
      val feed = ManifestTable.changesBetween(spark, path, 2L, 3L)
        .select("_change_type", "id").as[(String, Long)].collect().toSet
      assert(feed == Set(("insert", 7L), ("insert", 8L)))
      assert(ManifestTable.read(spark, path).count() == 100L)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("time travel reads each version's OWN vector state") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2,
        keepVersions = 3)
      ManifestTable.deleteKeysDV(spark, path, Seq(3L).toDF("id"))
      ManifestTable.deleteKeysDV(spark, path, Seq(4L).toDF("id"))
      assert(ManifestTable.readAt(spark, path, 1L).count() == 100L)
      assert(content(ManifestTable.readAt(spark, path, 2L)) ==
        content(base(100).filter(col("id") =!= 3L)))
      assert(content(ManifestTable.readAt(spark, path, 3L)) ==
        content(base(100).filter(!col("id").isin(3L, 4L))))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("a later copy-on-write merge of a dv'd file does NOT resurrect " +
    "its dead rows; retention keeps carried sidecars alive") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      ManifestTable.deleteKeysDV(spark, path, Seq(10L).toDF("id"))
      // CoW merge touching the SAME file (key 12 shares its range): the
      // survivors read must apply the vector or 10 comes back
      ManifestTable.merge(spark, path,
        Seq((12L, "upd_12", 99)).toDF("id", "name", "grp"))
      val got = content(ManifestTable.read(spark, path))
      assert(!got.exists(_._1 == 10L), "CoW rewrite resurrected a dv'd row")
      assert(got.contains((12L, "upd_12", 99)))
      // the rewrite materialized the touched file's vector: no dv refs
      // remain on the fresh entries it wrote
      val m = ManifestTable.readManifest(spark, path)
      // ... but entries NOT touched keep theirs (none here — the single
      // dv'd file was the touched one)
      assert(m.entries.forall(e =>
        e.dv.isEmpty || e.relPath.nonEmpty)) // dv refs, if any, stay valid

      // now mutate OTHER files twice so the dv commit's version retires:
      // the carried entries still point at the old sidecar, which
      // retention must keep (referenced-by-prefix)
      ManifestTable.deleteKeysDV(spark, path, Seq(600L).toDF("id"))
      ManifestTable.merge(spark, path,
        Seq((700L, "upd_700", 99)).toDF("id", "name", "grp"))
      ManifestTable.merge(spark, path,
        Seq((800L, "upd_800", 99)).toDF("id", "name", "grp"))
      val fin = content(ManifestTable.read(spark, path))
      assert(!fin.exists(r => r._1 == 10L || r._1 == 600L))
      assert(fin.exists(_._1 == 601L)) // neighbors intact
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("compaction MATERIALIZES the vectors: fresh entries carry no dv " +
    "refs and content is unchanged") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      ManifestTable.deleteKeysDV(spark, path,
        (0L to 30L).map(Tuple1(_)).toDF("id"))
      val want = content(ManifestTable.read(spark, path))
      ManifestTable.compactTable(spark, path, numFiles = 2)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.entries.forall(_.dv.isEmpty))
      assert(m.entries.map(_.rows).sum == 969L)
      assert(content(ManifestTable.read(spark, path)) == want)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("dead-ratio trigger: below threshold no-op, above it compacts " +
    "and clears the vectors") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      // strided deletes: dead rows spread over every file, so no file
      // fully dies (a dropped entry takes its dead count OUT of the
      // manifest — correctly: its read cost is gone too)
      ManifestTable.deleteKeysDV(spark, path,
        (0L until 1000L by 10).map(Tuple1(_)).toDF("id")) // 10% dead
      assert(!ManifestTable.maybeCompactDeadRatio(spark, path, 0.2, 2))
      assert(ManifestTable.readManifest(spark, path)
        .entries.exists(_.dv.isDefined))
      ManifestTable.deleteKeysDV(spark, path,
        (1L until 1000L by 5).map(Tuple1(_)).toDF("id")) // ~30% dead
      assert(ManifestTable.maybeCompactDeadRatio(spark, path, 0.2, 2))
      val m = ManifestTable.readManifest(spark, path)
      assert(m.entries.forall(_.dv.isEmpty))
      // 100 (≡0 mod 10) + 200 (≡1 mod 5 is disjoint from ≡0 mod 10)
      assert(ManifestTable.read(spark, path).count() == 700L)
      // post-compaction the ratio is 0 again
      assert(!ManifestTable.maybeCompactDeadRatio(spark, path, 0.2, 2))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("incremental consumer (mirror) converges across dv commits") {
    val root = java.nio.file.Files.createTempDirectory("graft_dv").toString
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      // retention must span both dv commits: the mirror's cursor sits at
      // v1 until the sync, so v1..v3 must all stay readable
      ManifestTable.create(base(), src, "id", numFiles = 4,
        keepVersions = 3)
      ManifestTable.create(ManifestTable.read(spark, src), dst, "id",
        numFiles = 4, tag = Some("1"))
      ManifestTable.deleteKeysDV(spark, src, Seq(42L, 43L).toDF("id"))
      ManifestTable.upsertDV(spark, src,
        Seq((44L, "upd_44", 99), (9999L, "ins", 99)).toDF("id", "name", "grp"))
      ManifestTable.syncMirror(spark, src, dst)
      assert(content(ManifestTable.read(spark, dst)) ==
        content(ManifestTable.read(spark, src)))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("upsertAndDeleteDV lands both in ONE commit; describe surfaces " +
    "the vector per file; manifest round-trips dv refs") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4,
        statsCols = Seq("grp"))
      val st = ManifestTable.upsertAndDeleteDV(spark, path,
        Seq((50L, "upd_50", 99)).toDF("id", "name", "grp"),
        Seq(60L).toDF("id"))
      assert(st.deadMarked == 2L) // 50 (replaced) + 60 (deleted)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.version == st.version)
      // serialization round-trip: re-read manifest sees the same refs
      val dvd = m.entries.filter(_.dv.isDefined)
      assert(dvd.nonEmpty && dvd.forall(_.dv.get.dead > 0L))
      val d = ManifestTable.describe(spark, path)
      assert(d.columns.takeRight(2).toSeq == Seq("dv_file", "dv_dead"))
      assert(d.filter(col("dv_file").isNotNull).count() == dvd.size.toLong)
      // secondary-stats pruning still applies the vector
      val pruned = ManifestTable.prunedRead(spark, path, "grp", 0, 6)
      assert(!content(pruned).exists(r => r._1 == 60L))
      assert(content(ManifestTable.read(spark, path)) ==
        content(base().filter(!col("id").isin(50L, 60L))
          .unionByName(Seq((50L, "upd_50", 99)).toDF("id", "name", "grp"))))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("read plan shape: a clean table reads as a plain scan (no join " +
    "anywhere); a dv'd table anti-joins ONLY the re-pointed files' " +
    "branch, broadcast per the manifest's dead counts") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      val cleanPlan =
        ManifestTable.read(spark, path).queryExecution.executedPlan.toString
      assert(!cleanPlan.contains("Join"),
        s"clean read must be a bare scan:\n$cleanPlan")
      ManifestTable.deleteKeysDV(spark, path, Seq(5L).toDF("id"))
      val dvPlan =
        ManifestTable.read(spark, path).queryExecution.executedPlan.toString
      assert(dvPlan.contains("LeftAnti"), s"dv read must anti-join:\n$dvPlan")
      assert(dvPlan.contains("BroadcastHashJoin"),
        s"small dead set must broadcast:\n$dvPlan")
      // the clean files' branch stays join-free: exactly one anti-join
      // (one sidecar group), not one per file
      assert(dvPlan.split("LeftAnti").length == 2,
        s"expected exactly one anti-join:\n$dvPlan")
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("consolidateDv folds several sidecars into one: one anti-join " +
    "group, content and dead counts unchanged, no data file touched") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      // two deletes touching DIFFERENT files → two sidecar groups
      ManifestTable.deleteKeysDV(spark, path, Seq(10L).toDF("id"))
      ManifestTable.deleteKeysDV(spark, path, Seq(800L).toDF("id"))
      val m0 = ManifestTable.readManifest(spark, path)
      assert(m0.entries.flatMap(_.dv.map(_.dvRel)).distinct.size == 2)
      val want = content(ManifestTable.read(spark, path))
      val bytesBefore = fileState(path).filter(!_._1.contains("-dv"))

      assert(ManifestTable.consolidateDv(spark, path))
      val m1 = ManifestTable.readManifest(spark, path)
      assert(m1.entries.flatMap(_.dv.map(_.dvRel)).distinct.size == 1)
      assert(m1.entries.flatMap(_.dv).map(_.dead).sum == 2L)
      val after = fileState(path)
      bytesBefore.foreach { case (rel, sig) =>
        assert(after.get(rel).contains(sig), s"$rel was touched") }
      assert(content(ManifestTable.read(spark, path)) == want)
      val plan =
        ManifestTable.read(spark, path).queryExecution.executedPlan.toString
      assert(plan.split("LeftAnti").length == 2,
        s"consolidated read must have ONE anti-join group:\n$plan")
      // idempotent: already-single is a no-op
      assert(!ManifestTable.consolidateDv(spark, path))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  /** Referenced sidecars' (file, key) pair multisets, one map per
    * sidecar — the duplicate-pair witness. */
  private def sidecarPairs(path: String): Map[String, Seq[(String, Long)]] =
    ManifestTable.readManifest(spark, path)
      .entries.flatMap(_.dv.map(_.dvRel)).distinct.map { rel =>
        rel -> spark.read.parquet(s"$path/$rel")
          .select(col("__f"), col("__k").cast("long"))
          .as[(String, Long)].collect().toSeq.sorted
      }.toMap

  test("a file's stale pairs surviving in ANOTHER still-referenced " +
    "sidecar must not double-count: the change feed across a " +
    "consolidation is EMPTY (no phantom resurrection of dead rows)") {
    val path = tmp()
    try {
      // two files X (ids 0-499) and Y (500-999)
      ManifestTable.create(base(), path, "id", numFiles = 2,
        keepVersions = 6)
      // d1 touches BOTH files → one shared sidecar S1
      ManifestTable.deleteKeysDV(spark, path, Seq(10L, 600L).toDF("id"))
      // d2 touches X only → X re-points to S2 (carrying its S1 pair);
      // S1 stays live for Y, so X's stale (X,10) pair SURVIVES in S1
      ManifestTable.deleteKeysDV(spark, path, Seq(20L).toDF("id"))
      val v3 = ManifestTable.readManifest(spark, path).version
      assert(ManifestTable.readManifest(spark, path)
        .entries.flatMap(_.dv.map(_.dvRel)).distinct.size == 2)

      // consolidation changes no live content — the feed across it must
      // be empty. A union-membership pair read would count (X,10) twice
      // on the from side (S2 carried + S1 stale) vs once on the to side
      // and exceptAll would emit dead row id=10 as a phantom ADD, which
      // a mirror or agg view would then silently resurrect.
      assert(ManifestTable.consolidateDv(spark, path))
      val v4 = ManifestTable.readManifest(spark, path).version
      val feed = ManifestTable.changesBetween(spark, path, v3, v4)
      assert(feed.isEmpty,
        s"consolidation emitted phantom changes: ${feed.collect().toSeq}")
      assert(content(ManifestTable.read(spark, path)) ==
        content(base().filter(!col("id").isin(10L, 600L, 20L))))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("carryOld writes each file's pairs from its OWN sidecar: a " +
    "repoint whose stale pairs also live in another live sidecar stays " +
    "(file, key)-unique, and the feed across it is exactly the batch") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 2,
        keepVersions = 6)
      // shared S1 (X+Y), then X-only S2: X's stale pairs persist in S1
      ManifestTable.deleteKeysDV(spark, path, Seq(10L, 600L).toDF("id"))
      ManifestTable.deleteKeysDV(spark, path, Seq(20L).toDF("id"))
      val vBefore = ManifestTable.readManifest(spark, path).version
      // d3 repoints BOTH files into one new sidecar; X's carryOld must
      // come from S2 alone — a union-membership read would also pick up
      // X's stale S1 subset and write (X,10) twice into the new sidecar
      ManifestTable.deleteKeysDV(spark, path, Seq(30L, 610L).toDF("id"))
      val m = ManifestTable.readManifest(spark, path)
      val vAfter = m.version
      sidecarPairs(path).foreach { case (rel, pairs) =>
        assert(pairs.distinct == pairs,
          s"sidecar $rel carries duplicate pairs: $pairs")
      }
      // per-file dead accounting intact through the consolidating repoint
      assert(m.entries.flatMap(_.dv).map(_.dead).sum == 5L)
      // and the feed over the repoint window is exactly the d3 batch
      val feed = ManifestTable.changesBetween(spark, path, vBefore, vAfter)
      assert(feed.select("_change_type", "id").as[(String, Long)]
        .collect().toSet == Set(("delete", 30L), ("delete", 610L)),
        "feed must be exactly the two deleted rows")
      assert(content(ManifestTable.read(spark, path)) ==
        content(base().filter(
          !col("id").isin(10L, 600L, 20L, 30L, 610L))))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("consolidateDv after a RESTORE: folds only the sidecars the " +
    "restored manifest references — a retained newer sidecar holding a " +
    "superset of a file's pairs must not leak its extra kills in") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 2,
        keepVersions = 6)
      // X-only then Y-only deletes → two referenced sidecars S1, S2
      ManifestTable.deleteKeysDV(spark, path, Seq(10L).toDF("id"))
      ManifestTable.deleteKeysDV(spark, path, Seq(600L).toDF("id"))
      val vTwo = ManifestTable.readManifest(spark, path).version
      // a third delete repoints X to S3 carrying {10, 20} — after the
      // restore S3 is unreferenced but still retained on disk
      ManifestTable.deleteKeysDV(spark, path, Seq(20L).toDF("id"))
      ManifestTable.restoreVersion(spark, path, vTwo)
      val vRestored = ManifestTable.readManifest(spark, path).version
      assert(content(ManifestTable.read(spark, path)) ==
        content(base().filter(!col("id").isin(10L, 600L))),
        "restore must resurrect id=20")

      assert(ManifestTable.consolidateDv(spark, path))
      val m = ManifestTable.readManifest(spark, path)
      assert(m.entries.flatMap(_.dv.map(_.dvRel)).distinct.size == 1)
      assert(m.entries.flatMap(_.dv).map(_.dead).sum == 2L)
      // id=20's kill lives only in the unreferenced S3 — the folded
      // sidecar must not have picked it up
      assert(content(ManifestTable.read(spark, path)) ==
        content(base().filter(!col("id").isin(10L, 600L))))
      val feed = ManifestTable.changesBetween(spark, path, vRestored,
        m.version)
      assert(feed.isEmpty,
        s"consolidation after restore emitted ${feed.collect().toSeq}")
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("Z-ordered table: dv ops preserve the curve (no rewrite), and the " +
    "Z-aware compaction materializes the vectors") {
    val path = tmp()
    try {
      val df = base()
      ManifestTable.createZOrdered(df, path, "id", numFiles = 4,
        zColA = "id", zColB = "grp")
      val bytesBefore = fileState(path)
      ManifestTable.deleteKeysDV(spark, path, Seq(10L, 20L).toDF("id"))
      val after = fileState(path)
      bytesBefore.foreach { case (rel, sig) =>
        assert(after.get(rel).contains(sig), s"$rel was rewritten") }
      val m1 = ManifestTable.readManifest(spark, path)
      assert(m1.zCols.contains(("id", "grp")), "layout record preserved")
      // compactTable dispatches onto the recorded curve and applies the
      // vectors while rewriting
      ManifestTable.compactTable(spark, path, numFiles = 2)
      val m2 = ManifestTable.readManifest(spark, path)
      assert(m2.zCols.contains(("id", "grp")) && m2.entries.forall(_.dv.isEmpty))
      assert(content(ManifestTable.read(spark, path)) ==
        content(base().filter(!col("id").isin(10L, 20L))))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("partitioned table: dv delete keeps partition addressing; dv " +
    "upsert appends partition-pure") {
    val path = tmp()
    try {
      val df = (0 until 300).map(i => (i.toLong, s"p${i % 3}", s"v_$i"))
        .toDF("id", "pt", "payload")
      ManifestTable.createPartitioned(df, path, "id", "pt")
      val bytesBefore = fileState(path)
      ManifestTable.deleteKeysDV(spark, path, Seq(30L, 31L).toDF("id"))
      val after = fileState(path)
      bytesBefore.foreach { case (rel, sig) =>
        assert(after.get(rel).contains(sig), s"$rel was rewritten") }
      ManifestTable.upsertDV(spark, path,
        Seq((30L, "p0", "re_30")).toDF("id", "pt", "payload"))
      // partition ops still address correctly after dv commits
      val p0 = ManifestTable.readPartitions(spark, path, Seq("p0"))
        .select("id", "pt", "payload").as[(Long, String, String)]
        .collect().toSet
      val want = df.filter(col("pt") === "p0" && !col("id").isin(30L, 31L))
        .as[(Long, String, String)].collect().toSet +
        ((30L, "p0", "re_30"))
      assert(p0 == want)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }
}
