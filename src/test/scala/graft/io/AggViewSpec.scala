package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance (io/AggView.scala): the view
  * must equal a full recompute after every sync, absorb replays via the
  * per-group version stamp, and drop vanished groups. */
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

  test("view equals a full recompute after every sync; replays converge " +
    "via the per-group stamp; vanished groups are dropped") {
    val root = java.nio.file.Files.createTempDirectory("graft_aggview")
    val src = s"$root/src"; val view = s"$root/view"; val cur = s"$root/cursor"
    try {
      ManifestTable.create(
        (0L to 59L).map(i => (i, s"g${i % 5}", i * 10))
          .toDF("id", "grp", "val"),
        src, "id", numFiles = 4)
      AggView.bootstrap(spark, src, view, cur, "grp", "val")
      assert(viewContent(view) == recompute(src))

      // update values + insert a brand-new group
      ManifestTable.merge(spark, src,
        Seq((3L, "g3", 5000L), (100L, "gNEW", 7L), (101L, "gNEW", 8L))
          .toDF("id", "grp", "val"))
      assert(AggView.sync(spark, src, view, cur, "grp", "val")
        .contains((1L, 2L)))
      assert(viewContent(view) == recompute(src))

      // replay the SAME feed (crash between apply and cursor): stamps
      // must skip every group
      AggView.applyFeed(spark, view,
        ManifestTable.changesBetween(spark, src, 1L, 2L), 2L, "grp", "val")
      assert(viewContent(view) == recompute(src), "replay must converge")

      // delete every row of gNEW → the group must vanish from the view
      ManifestTable.deleteKeys(spark, src, Seq(100L, 101L).toDF("id"))
      assert(AggView.sync(spark, src, view, cur, "grp", "val")
        .contains((2L, 3L)))
      assert(viewContent(view) == recompute(src))
      assert(!viewContent(view).exists(_._1 == "gNEW"),
        "vanished group must leave the view")

      // caught up
      assert(AggView.sync(spark, src, view, cur, "grp", "val").isEmpty)

      // crash window 2: applyFeed ran but the cursor did not advance —
      // the next sync() re-derives the same feed and must converge,
      // then advance the cursor
      ManifestTable.merge(spark, src,
        Seq((7L, "g2", 999L)).toDF("id", "grp", "val"))
      AggView.applyFeed(spark, view,
        ManifestTable.changesBetween(spark, src, 3L, 4L), 4L, "grp", "val")
      assert(AggView.sync(spark, src, view, cur, "grp", "val")
        .contains((3L, 4L)))
      assert(viewContent(view) == recompute(src))
    } finally Fs.deleteRecursively(root)
  }
}
