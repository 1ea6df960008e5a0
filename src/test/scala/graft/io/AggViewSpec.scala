package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance (io/AggView.scala): the view
  * must equal a full recompute after every sync, and — because the
  * cursor is the view-manifest TAG committed atomically with the data —
  * every crash window must converge, including the two a separate
  * cursor file cannot handle: replaying a feed that vanished a group,
  * and a crash followed by further source commits. */
class AggViewSpec extends SparkSpec {
  import spark.implicits._

  private def recompute(src: String): Set[(String, Long, Long)] =
    ManifestTable.read(spark, src)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("val").as("total"))
      .as[(String, Long, Long)].collect().toSet

  private def viewContent(view: String): Set[(String, Long, Long)] =
    ManifestTable.read(spark, view)
      .select("grp", "n", "total")
      .as[(String, Long, Long)].collect().toSet

  test("view equals a full recompute after every sync; replays converge; " +
    "vanished groups are dropped") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggview")
    val src = s"$root/src"; val view = s"$root/view"
    try {
      ManifestTable.create(
        (0L to 59L).map(i => (i, s"g${i % 5}", i * 10))
          .toDF("id", "grp", "val"),
        src, "id", numFiles = 4)
      // numFiles 4: a MULTI-file view drives the general (probe job +
      // copy-on-write) sync path; the 1-file default elsewhere covers
      // the fused single-job swap — both paths must stay green
      AggView.bootstrap(spark, src, view, "grp", "val", numFiles = 4)
      assert(viewContent(view) == recompute(src))

      // update values + insert a brand-new group
      ManifestTable.merge(spark, src,
        Seq((3L, "g3", 5000L), (100L, "gNEW", 7L), (101L, "gNEW", 8L))
          .toDF("id", "grp", "val"))
      assert(AggView.sync(spark, src, view, "grp", "val")
        .contains((1L, 2L)))
      assert(viewContent(view) == recompute(src))

      // sync again without new source commits: caught up, no change
      assert(AggView.sync(spark, src, view, "grp", "val").isEmpty)
      assert(viewContent(view) == recompute(src))

      // delete every row of gNEW → the group must vanish from the view
      ManifestTable.deleteKeys(spark, src, Seq(100L, 101L).toDF("id"))
      assert(AggView.sync(spark, src, view, "grp", "val")
        .contains((2L, 3L)))
      assert(viewContent(view) == recompute(src))
      assert(!viewContent(view).exists(_._1 == "gNEW"),
        "vanished group must leave the view")
    } finally Fs.deleteRecursively(root)
  }

  test("syncMany: one materialized window serves several views; views at " +
    "different cursors get their own windows; per-view tags advance") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggmany")
    val src = s"$root/src"
    val v1 = s"$root/v1"; val v2 = s"$root/v2"
    try {
      ManifestTable.create(
        (0L to 59L).map(i => (i, s"g${i % 5}", s"h${i % 3}", i * 10))
          .toDF("id", "grp", "g2", "val"),
        // keepVersions 3: v2 deliberately lags TWO source commits in
        // this fixture, which the default window would rightly refuse
        src, "id", numFiles = 4, keepVersions = 3)
      AggView.bootstrap(spark, src, v1, "grp", "val")
      AggView.bootstrap(spark, src, v2, "g2", "val")
      ManifestTable.merge(spark, src,
        Seq((3L, "g3", "h0", 5000L), (100L, "gNEW", "hNEW", 7L))
          .toDF("id", "grp", "g2", "val"))                     // src v2
      // advance only v1 → the cursors diverge
      assert(AggView.sync(spark, src, v1, "grp", "val").contains((1L, 2L)))
      ManifestTable.deleteKeys(spark, src, Seq(100L).toDF("id")) // src v3
      val res = AggView.syncMany(spark, src,
        Seq((v1, "grp", "val"), (v2, "g2", "val")))
      assert(res == Seq(Some((2L, 3L)), Some((1L, 3L))),
        s"each view must get exactly its own unseen window, got $res")
      def re(c: String) = ManifestTable.read(spark, src).groupBy(c)
        .agg(count(lit(1)).as("n"), sum("val").as("total"))
        .as[(String, Long, Long)].collect().toSet
      assert(viewContent(v1) == re("grp"))
      assert(ManifestTable.read(spark, v2).select("g2", "n", "total")
        .as[(String, Long, Long)].collect().toSet == re("g2"))
      assert(!viewContent(v1).exists(_._1 == "gNEW"),
        "the vanished group must leave v1 through the shared window too")
      // caught up: all None, no version burned
      assert(AggView.syncMany(spark, src,
        Seq((v1, "grp", "val"), (v2, "g2", "val"))).forall(_.isEmpty))
    } finally Fs.deleteRecursively(root)
  }

  test("extremes view: inserts fold min/max for free; a delete tying " +
    "the stored extreme recomputes ONLY the affected groups; duplicated " +
    "extremes survive one deletion; vanished groups leave") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggvx")
    val src = s"$root/src"; val view = s"$root/view"
    def recomputeX(): Set[(String, Long, Long, Long, Long)] =
      ManifestTable.read(spark, src).groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("val").as("total"),
          min("val").as("mn"), max("val").as("mx"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
    def viewX(): Set[(String, Long, Long, Long, Long)] =
      ManifestTable.read(spark, view)
        .as[(String, Long, Long, Long, Long)].collect().toSet
    try {
      // g0 holds a DUPLICATED minimum (two rows with val 0): deleting
      // one must keep min 0 — exactly the case the conservative
      // recompute resolves correctly
      ManifestTable.create(
        ((0L to 59L).map(i => (i, s"g${i % 5}", (i / 5) * 10)) :+
          ((100L, "g0", 0L))).toDF("id", "grp", "val"),
        src, "id", numFiles = 4)
      AggView.bootstrapExtremes(spark, src, view, "grp", "val")
      assert(viewX() == recomputeX())

      // pure inserts: a new global max for g1 and a new group — the
      // fold path, no recompute
      ManifestTable.merge(spark, src,
        Seq((200L, "g1", 99999L), (201L, "gNEW", 7L))
          .toDF("id", "grp", "val"))
      assert(AggView.syncExtremes(spark, src, view, "grp", "val")
        .contains((1L, 2L)))
      assert(viewX() == recomputeX())

      // delete ONE of g0's two min-witnesses: min must stay 0
      ManifestTable.deleteKeys(spark, src, Seq(100L).toDF("id"))
      AggView.syncExtremes(spark, src, view, "grp", "val")
      assert(viewX() == recomputeX())
      assert(viewX().find(_._1 == "g0").get._4 == 0L,
        "duplicated minimum must survive deleting one witness")

      // delete the LAST min-witness of g0 (id 0, val 0) → new min is
      // g0's next value; and delete a NON-extreme of g2 (no recompute
      // effect on its extremes)
      ManifestTable.deleteKeys(spark, src, Seq(0L, 12L).toDF("id"))
      AggView.syncExtremes(spark, src, view, "grp", "val")
      assert(viewX() == recomputeX())
      assert(viewX().find(_._1 == "g0").get._4 > 0L)

      // update that MOVES a key across groups (del in one, add in the
      // other) + vanish gNEW entirely
      ManifestTable.merge(spark, src,
        Seq((201L, "g3", 7L)).toDF("id", "grp", "val"))
      AggView.syncExtremes(spark, src, view, "grp", "val")
      assert(viewX() == recomputeX())
      assert(!viewX().exists(_._1 == "gNEW"))

      // caught up → None; replay convergence via the tag
      assert(AggView.syncExtremes(spark, src, view, "grp", "val").isEmpty)
      assert(viewX() == recomputeX())
    } finally Fs.deleteRecursively(root)
  }

  test("AggViewJob: bootstrap on first run, sync on later runs, refusal " +
    "of a foreign untagged view") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggviewjob")
    val src = s"$root/src"; val view = s"$root/view"
    try {
      ManifestTable.create(
        (0L to 19L).map(i => (i, s"g${i % 3}", 5L)).toDF("id", "grp", "val"),
        src, "id", numFiles = 2)
      assert(graft.jobs.AggViewJob.run(spark, src, view, "grp", "val")
        .contains((0L, 1L)))
      assert(viewContent(view) == recompute(src))
      ManifestTable.merge(spark, src,
        Seq((0L, "g0", 100L)).toDF("id", "grp", "val"))
      assert(graft.jobs.AggViewJob.run(spark, src, view, "grp", "val")
        .contains((1L, 2L)))
      assert(viewContent(view) == recompute(src))
      assert(graft.jobs.AggViewJob.run(spark, src, view, "grp", "val").isEmpty)
      // a foreign (untagged) table at the view path is refused
      val foreign = s"$root/foreign"
      ManifestTable.create(Seq((1L, "g", 2L)).toDF("id", "grp", "val"),
        foreign, "id", numFiles = 1)
      val e = intercept[IllegalStateException] {
        graft.jobs.AggViewJob.run(spark, src, foreign, "grp", "val")
      }
      assert(e.getMessage.contains("no sync tag"))
    } finally Fs.deleteRecursively(root)
  }

  test("crash window A: a feed that VANISHED a group replays as a no-op " +
    "(the atomic tag absorbs it — no phantom negative-count group)") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggview_a")
    val src = s"$root/src"; val view = s"$root/view"
    try {
      ManifestTable.create(
        Seq((1L, "gA", 10L), (2L, "gA", 20L), (3L, "gB", 30L))
          .toDF("id", "grp", "val"), src, "id", numFiles = 2)
      AggView.bootstrap(spark, src, view, "grp", "val")
      // source deletes ALL of gA → v2; sync applies it fully
      ManifestTable.deleteKeys(spark, src, Seq(1L, 2L).toDF("id"))
      assert(AggView.sync(spark, src, view, "grp", "val")
        .contains((1L, 2L)))
      assert(viewContent(view) == Set(("gB", 1L, 30L)))
      // "replay" of the same feed — what a crashed consumer would do if
      // the cursor were separate from the data. With the tag-based
      // cursor, sync sees itself caught up and must NOT re-apply the
      // negative delta (which would create gA with n = -2).
      assert(AggView.sync(spark, src, view, "grp", "val").isEmpty)
      assert(viewContent(view) == Set(("gB", 1L, 30L)),
        "no phantom negative-count group after replay")
      // a DIRECT applyFeed replay at the already-applied targetV is a
      // no-op too (the tag guard — an insert-heavy replay would
      // otherwise double-count without tripping the below-zero check)
      AggView.applyFeed(spark, view,
        ManifestTable.changesBetween(spark, src, 1L, 2L), 2L, "grp", "val")
      assert(viewContent(view) == Set(("gB", 1L, 30L)),
        "direct replay at the applied targetV must not re-apply")
      // and a FOREIGN re-application of the same feed fails loudly
      // instead of silently writing negative counts
      val e = intercept[IllegalStateException] {
        AggView.applyFeed(spark, view,
          ManifestTable.changesBetween(spark, src, 1L, 2L), 99L,
          "grp", "val")
      }
      assert(e.getMessage.contains("below zero"))
    } finally Fs.deleteRecursively(root)
  }

  test("crash window B: source advances between a torn sync's apply and " +
    "retry — the tag keeps the windows from overlapping (no double-apply)") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggview_b")
    val src = s"$root/src"; val view = s"$root/view"
    try {
      ManifestTable.create(
        (0L to 9L).map(i => (i, s"g${i % 2}", 100L)).toDF("id", "grp", "val"),
        src, "id", numFiles = 2)
      AggView.bootstrap(spark, src, view, "grp", "val")
      // source commit v2, FULLY applied (tag advanced atomically with
      // the data — with a separate cursor file, this is where the
      // cursor write could be lost while the data apply survived)
      ManifestTable.merge(spark, src,
        Seq((0L, "g0", 999L)).toDF("id", "grp", "val"))
      assert(AggView.sync(spark, src, view, "grp", "val")
        .contains((1L, 2L)))
      // source advances again BEFORE the consumer's next run
      ManifestTable.merge(spark, src,
        Seq((1L, "g1", 888L)).toDF("id", "grp", "val"))
      // the retry must apply ONLY v2→v3 — a lost-cursor design would
      // re-derive v1→v3 and double-apply the v1→v2 portion
      assert(AggView.sync(spark, src, view, "grp", "val")
        .contains((2L, 3L)))
      assert(viewContent(view) == recompute(src),
        "windows must not overlap across the crash")
    } finally Fs.deleteRecursively(root)
  }

  test("a sync window covering only a source compaction advances the " +
    "tag without rewriting the view") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggview_c")
    val src = s"$root/src"; val view = s"$root/view"
    try {
      ManifestTable.create(
        (0L to 9L).map(i => (i, s"g${i % 2}", 10L)).toDF("id", "grp", "val"),
        src, "id", numFiles = 2)
      AggView.bootstrap(spark, src, view, "grp", "val")
      ManifestTable.compactTable(spark, src, numFiles = 1) // v2, no changes
      val entriesBefore = ManifestTable.readManifest(spark, view).entries
      assert(AggView.sync(spark, src, view, "grp", "val")
        .contains((1L, 2L)))
      val mAfter = ManifestTable.readManifest(spark, view)
      assert(mAfter.tag.contains("2"))
      assert(mAfter.entries == entriesBefore,
        "a compaction-only window must not rewrite any view file")
      assert(AggView.sync(spark, src, view, "grp", "val").isEmpty)
    } finally Fs.deleteRecursively(root)
  }
}
