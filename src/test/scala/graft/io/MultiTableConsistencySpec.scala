package graft.io

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * CROSS-TABLE consistency capstone: the isolation model of the
 * manifest-table ecosystem is TAG-PINNED SNAPSHOT reads. A consumer
 * table (agg view, mirror) carries in its manifest TAG the exact
 * source version its content reflects, committed by the same atomic
 * rename as the data — so a reader that pins ONE consumer manifest
 * version gets a (content, cursor) pair that can never disagree, and
 * aligning tables on a common source version yields a consistent
 * cross-table snapshot even while writers and consumers advance
 * concurrently. There is no cross-table transaction and none is
 * needed: every individual commit is atomic, every consumer state is
 * self-describing, and "torn" state is unobservable by construction —
 * these tests pin exactly that.
 */
class MultiTableConsistencySpec extends SparkSpec {
  import spark.implicits._

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("grp").agg(count(lit(1)).as("n"), sum("val").as("total"))
      .as[(String, Long, Long)].collect().toSet

  test("tag-pinned reads: at EVERY retained view/mirror version, the " +
    "content equals a recompute of the source AT the tagged version — " +
    "across staggered sync points") {
    val root = java.nio.file.Files.createTempDirectory("graft_mtc")
    val src = s"$root/src"; val view = s"$root/view"; val mir = s"$root/mir"
    try {
      ManifestTable.create(
        (0L to 99L).map(i => (i, s"g${i % 4}", i)).toDF("id", "grp", "val"),
        src, "id", numFiles = 4, keepVersions = 12)
      AggView.bootstrap(spark, src, view, "grp", "val")
      // mirror bootstrap: content pinned AT the tagged version (the
      // bootstrap-read contract — resolving latest twice would race)
      val srcV0 = ManifestTable.readManifest(spark, src).version
      ManifestTable.create(ManifestTable.readAt(spark, src, srcV0), mir,
        "id", numFiles = 2, tag = Some(srcV0.toString), keepVersions = 12)

      // staggered history: source advances every step, consumers sync
      // at different cadences (view every step, mirror every 2nd)
      (1 to 6).foreach { k =>
        ManifestTable.merge(spark, src,
          Seq((k.toLong * 7, s"g${k % 4}", 1000L + k),
            (200L + k, "gX", k.toLong)).toDF("id", "grp", "val"))
        AggView.sync(spark, src, view, "grp", "val")
        if (k % 2 == 0) ManifestTable.syncMirror(spark, src, mir)
      }

      // THE INVARIANT, checked at every retained version of BOTH
      // consumers: pinned content ≡ recompute of the source at the
      // pinned tag. A torn commit (data without cursor or vice versa)
      // at any point in the history breaks at least one version.
      def versionsOf(p: String): Seq[Long] =
        ManifestTable.history(spark, p).select("version")
          .as[Long].collect().toSeq
      versionsOf(view).foreach { v =>
        val m = ManifestTable.readManifestAt(spark, view, v)
        val tagged = m.tag.get.toLong
        val got = ManifestTable.readAt(spark, view, v)
          .select("grp", "n", "total").as[(String, Long, Long)]
          .collect().toSet
        assert(got == rollup(ManifestTable.readAt(spark, src, tagged)),
          s"view v$v (tag $tagged) is torn")
      }
      versionsOf(mir).foreach { v =>
        val m = ManifestTable.readManifestAt(spark, mir, v)
        val tagged = m.tag.get.toLong
        val got = ManifestTable.readAt(spark, mir, v)
          .as[(Long, String, Long)].collect().toSet
        val want = ManifestTable.readAt(spark, src, tagged)
          .as[(Long, String, Long)].collect().toSet
        assert(got == want, s"mirror v$v (tag $tagged) is torn")
      }

      // cross-table alignment: sync both to the SAME source version;
      // the mirror's rollup must then equal the view exactly — the
      // consistent two-table snapshot a dashboard join relies on
      AggView.sync(spark, src, view, "grp", "val")
      ManifestTable.syncMirror(spark, src, mir)
      val tv = ManifestTable.readTag(spark, view).get
      val tm = ManifestTable.readTag(spark, mir).get
      assert(tv == tm, s"both caught-up consumers must sit at the same " +
        s"source version, got view=$tv mirror=$tm")
      assert(rollup(ManifestTable.read(spark, mir)) ==
        ManifestTable.read(spark, view).select("grp", "n", "total")
          .as[(String, Long, Long)].collect().toSet)
    } finally Fs.deleteRecursively(root)
  }

  test("concurrent writer + consumer + reader: the reader NEVER observes " +
    "a view state that disagrees with the source at its own tag") {
    val root = java.nio.file.Files.createTempDirectory("graft_mtc2")
    val src = s"$root/src"; val view = s"$root/view"
    try {
      ManifestTable.create(
        (0L to 79L).map(i => (i, s"g${i % 3}", i)).toDF("id", "grp", "val"),
        src, "id", numFiles = 2, keepVersions = 30)
      AggView.bootstrap(spark, src, view, "grp", "val")

      val failures = new ConcurrentLinkedQueue[String]()
      @volatile var writing = true
      val writer = new Thread(() => {
        try (1 to 6).foreach { k =>
          ManifestTable.merge(spark, src,
            Seq((k.toLong * 11, s"g${k % 3}", 500L + k))
              .toDF("id", "grp", "val"))
          Thread.sleep(30)
        } catch { case t: Throwable => failures.add(s"writer: $t") }
        finally writing = false
      })
      val consumer = new Thread(() => {
        try {
          while (writing) {
            AggView.sync(spark, src, view, "grp", "val")
            Thread.sleep(20)
          }
          AggView.sync(spark, src, view, "grp", "val") // drain
        } catch { case t: Throwable => failures.add(s"consumer: $t") }
      })
      val reader = new Thread(() => {
        try {
          var rounds = 0
          while ((writing || rounds < 3) && rounds < 60) {
            // PIN one view manifest version, then read content and
            // recompute through that SAME pin — the isolation contract
            val m = ManifestTable.readManifest(spark, view)
            val tagged = m.tag.get.toLong
            val got = ManifestTable.readAt(spark, view, m.version)
              .select("grp", "n", "total").as[(String, Long, Long)]
              .collect().toSet
            val want = rollup(ManifestTable.readAt(spark, src, tagged))
            if (got != want)
              failures.add(s"torn view at v${m.version} tag $tagged: " +
                s"got $got want $want")
            rounds += 1
            Thread.sleep(15)
          }
        } catch { case t: Throwable => failures.add(s"reader: $t") }
      })
      Seq(writer, consumer, reader).foreach(_.start())
      Seq(writer, consumer, reader).foreach(_.join(120000))
      assert(failures.isEmpty,
        s"observed torn state: ${failures.toArray.mkString("; ")}")
      // end state: fully caught up and exact
      assert(ManifestTable.readTag(spark, view).get.toLong ==
        ManifestTable.readManifest(spark, src).version)
      assert(ManifestTable.read(spark, view).select("grp", "n", "total")
        .as[(String, Long, Long)].collect().toSet ==
        rollup(ManifestTable.read(spark, src)))
    } finally Fs.deleteRecursively(root)
  }
}
