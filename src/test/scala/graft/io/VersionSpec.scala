package graft.io

import graft.SparkSpec

/** Time travel over versioned components ([[Tables.resolveComponentAt]] /
  * [[Tables.componentVersions]]): the retention window of compactSorted
  * (previous version kept for one cycle) is READABLE by version number,
  * not just implicitly by in-flight scans. */
class VersionSpec extends SparkSpec {
  import spark.implicits._

  test("componentVersions + resolveComponentAt expose the retention " +
    "window; retired and uncommitted versions are unreadable") {
    val root = java.nio.file.Files.createTempDirectory("graft_ver")
    val dir = s"$root/comp"
    def rows(p: String): Set[Long] =
      spark.read.parquet(p).select("id").as[Long].collect().toSet
    try {
      (0L to 9L).toDF("id") // version 0: the flat legacy layout
        .transform(df => { Tables.writeSortedBy(df, dir, 1, "id"); df })
      assert(Tables.componentVersions(spark, dir) == Seq(0L))

      // compaction 1 drops id 0 (a takedown applied physically) → v1;
      // retention keeps the flat v0 for one cycle
      Tables.compactSorted(spark, dir, 1, dedupe = false, "id")(
        _.filter(org.apache.spark.sql.functions.col("id") > 0))
      assert(Tables.componentVersions(spark, dir) == Seq(0L, 1L))
      assert(rows(Tables.resolveComponentAt(spark, dir, 0).get)
        == (0L to 9L).toSet, "v0 snapshot must still read the pre-delete rows")
      assert(rows(Tables.resolveComponentAt(spark, dir, 1).get)
        == (1L to 9L).toSet)
      assert(Tables.resolveComponent(spark, dir) == s"$dir-v1")

      // compaction 2 (identity) → v2; v0's data is retired by retention
      Tables.compactSorted(spark, dir, 1, dedupe = false, "id")()
      assert(Tables.componentVersions(spark, dir) == Seq(1L, 2L))
      assert(Tables.resolveComponentAt(spark, dir, 0).isEmpty,
        "retired version must not resolve")
      assert(rows(Tables.resolveComponentAt(spark, dir, 1).get)
        == (1L to 9L).toSet)
      assert(rows(Tables.resolveComponentAt(spark, dir, 2).get)
        == (1L to 9L).toSet)

      // an uncommitted orphan (crashed compaction: data dir, no
      // manifest) is invisible to time travel too
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$dir-v7"))
      assert(Tables.resolveComponentAt(spark, dir, 7).isEmpty)
      assert(Tables.componentVersions(spark, dir) == Seq(1L, 2L))
    } finally Fs.deleteRecursively(root)
  }
}
