package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The m26 lifecycle chain's PHYSICAL twins (the declared query gates
  * the logical result against DuckDB): forking a retained snapshot,
  * then rename → widen → deleteWhere → merge → maintain on the fork
  * must (a) leave the source byte-identical throughout, and (b) emit a
  * change feed over the WHOLE window that a mirror can fold back into
  * exactly the final table — through the rename, the widening, both
  * delete tiers, the append and whatever maintain rewrote. */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lc").toString

  // INT key on purpose (the chain widens it); priorities cycle so the
  // deleteWhere OR-arm has victims everywhere
  private def df: DataFrame =
    (0 until 1000).map(i => (i, Seq("1-URGENT", "2-HIGH", "3-LOW")(i % 3),
      i * 10L)).toDF("id", "prio", "cents")

  private def dataFiles(path: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(path)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        out(root.relativize(p).toString) =
          java.nio.file.Files.getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  private def content(d: DataFrame): Seq[String] =
    d.select(col("id").cast("long"), col("priority"), col("cents"))
      .collect().map(_.toString).toSeq.sorted

  test("the full chain: source byte-identical throughout; the CDF " +
    "mirror over the whole window converges to the final table") {
    val root = tmp()
    val src = s"$root/src"; val dst = s"$root/dst"
    try {
      ManifestTable.create(df, src, "id", numFiles = 8, keepVersions = 4)
      // source moves on AFTER the fork point
      ManifestTable.merge(spark, src,
        df.filter(col("id") % 7 === 0)
          .select(col("id"), lit("SRC-ONLY").as("prio"), col("cents")))
      val srcFiles = dataFiles(src)
      val srcRows = ManifestTable.read(spark, src).count()

      ManifestTable.shallowClone(spark, src, dst, keepVersions = 10,
        asOfVersion = Some(1L))
      ManifestTable.renameColumn(spark, dst, "prio", "priority")
      ManifestTable.widenColumn(spark, dst, "id", LongType)
      ManifestTable.deleteWhere(spark, dst,
        col("id") <= 250L || col("priority") === "1-URGENT")
      ManifestTable.merge(spark, dst,
        df.filter(col("id") % 11 === 5)
          .select((col("id").cast("long") + 3000000000L).as("id"),
            lit("WIDE").as("priority"), (col("cents") + 13L).as("cents")))
      val r = ManifestTable.maintain(spark, dst)
      assert(r.vacuumed)

      // (a) the source never noticed
      assert(dataFiles(src) == srcFiles,
        "the fork's whole life must not touch one source byte")
      assert(ManifestTable.read(spark, src).count() == srcRows)
      assert(ManifestTable.read(spark, src)
        .filter(col("prio") === "SRC-ONLY").count() > 0,
        "the source's own post-fork merge stays visible on the source")

      // (b) a mirror folding the whole window equals the final table
      val head = ManifestTable.readManifest(spark, dst).version
      val (adds, dels, _) =
        ManifestTable.changeSidesBetween(spark, dst, 1L, head)
      // the v1 snapshot serves the ORIGINAL schema; the mirror maps it
      // forward exactly like any external CDC consumer would
      val snapshot = ManifestTable.readAt(spark, dst, 1L)
        .select(col("id").cast("long").as("id"),
          col("prio").as("priority"), col("cents"))
      val mirror = snapshot.exceptAll(dels.select("id", "priority", "cents"))
        .unionByName(adds.select("id", "priority", "cents"))
      assert(content(mirror) == content(ManifestTable.read(spark, dst)),
        "the change feed must reconstruct the final table exactly")
      // sanity on the final state itself: both delete tiers fired and
      // the wide keys landed
      val fin = ManifestTable.read(spark, dst)
      assert(fin.filter(col("id") <= 250L).count() == 0L)
      assert(fin.filter(col("priority") === "1-URGENT").count() == 0L)
      assert(fin.filter(col("id") > 3000000000L).count() ==
        df.filter(col("id") % 11 === 5).count())
    } finally Fs.deleteRecursively(root)
  }
}
