package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** updateWhere — predicate UPDATE through one deletion-vector commit:
  * old images die in sidecars, post-images append, no data file is
  * rewritten, and SET expressions see the row's current values. */
class UpdateWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_uw").toString + "/t"

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  private def df: DataFrame =
    (0 until 1000).map(i => (i.toLong, i * 10L,
      if (i % 11 == 0) null else s"${('A' + i % 3).toChar}"))
      .toDF("id", "cents", "prio")

  private def make(path: String): Unit =
    ManifestTable.create(df, path, "id", numFiles = 10,
      statsCols = Seq("prio"))

  private def dataFiles(path: String): Set[String] = {
    val root = java.nio.file.Paths.get(path)
    val out = scala.collection.mutable.Set.empty[String]
    java.nio.file.Files.walk(root).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && p.toString.contains("/data/") &&
          !p.getParent.getFileName.toString.endsWith("-dv"))
        out += root.relativize(p).toString
    }
    out.toSet
  }

  test("SET expressions read current values; only matching rows change; " +
    "the original files are never rewritten (dv + one append only)") {
    val path = tmp()
    try {
      make(path)
      val before = dataFiles(path)
      val st = ManifestTable.updateWhere(spark, path,
        col("id") < 300L && col("prio") === "A",
        Map("cents" -> (col("cents") + 7L), "prio" -> lit("HOT")))
      val touched = df.filter(col("id") < 300L && col("prio") === "A").count()
      assert(st.deadMarked == touched && st.filesWritten == 1)
      val after = dataFiles(path)
      assert(before.subsetOf(after), "original data files must survive")
      assert((after -- before).size == 1, "exactly the one appended file")
      val got = ManifestTable.read(spark, path)
      assert(got.count() == 1000L)
      assert(got.filter(col("prio") === "HOT").count() == touched)
      // the +7 landed on the OLD cents values
      assert(got.filter(col("prio") === "HOT")
        .filter(col("cents") % 10L =!= 7L).count() == 0L)
      // null-prio rows untouched (cond NULL -> no update)
      assert(got.filter(col("prio").isNull).count() ==
        df.filter(col("prio").isNull).count())
    } finally cleanup(path)
  }

  test("CDF across updateWhere labels the pairs update_pre/update_post") {
    val path = tmp()
    try {
      make(path)
      val v0 = ManifestTable.readManifest(spark, path).version
      val st = ManifestTable.updateWhere(spark, path, col("id") === 42L,
        Map("cents" -> lit(999L)))
      val ch = ManifestTable.changesBetween(spark, path, v0, st.version)
        .filter(col("id") === 42L)
      val byType = ch.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map("update_pre" -> 1L, "update_post" -> 1L))
      assert(ch.filter(col("_change_type") === "update_post")
        .first().getAs[Long]("cents") == 999L)
    } finally cleanup(path)
  }

  test("key updates and unknown SET columns are refused; a no-match " +
    "predicate burns no version") {
    val path = tmp()
    try {
      make(path)
      intercept[IllegalArgumentException] {
        ManifestTable.updateWhere(spark, path, lit(true),
          Map("id" -> lit(1L)))
      }
      intercept[IllegalArgumentException] {
        ManifestTable.updateWhere(spark, path, lit(true),
          Map("nope" -> lit(1L)))
      }
      val v0 = ManifestTable.readManifest(spark, path).version
      val st = ManifestTable.updateWhere(spark, path, col("id") > 5000L,
        Map("cents" -> lit(0L)))
      assert(st.version == v0)
      assert(ManifestTable.readManifest(spark, path).version == v0)
    } finally cleanup(path)
  }
}
