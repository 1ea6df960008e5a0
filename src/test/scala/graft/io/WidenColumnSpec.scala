package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** widenColumn — type widening as a metadata-only commit: zero files
  * move, the reader promotes old files' physical type, and all stats /
  * dv / merge machinery keeps working in the wider type. */
class WidenColumnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_wc").toString + "/t"

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  private def df: DataFrame =
    (0 until 1000).map(i => (i, i * 10L, i.toFloat / 2))
      .toDF("id", "cents", "ratio") // id is INT on purpose

  private def dataFiles(path: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(path)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet") &&
          p.toString.contains("/data/") &&
          !p.getParent.getFileName.toString.endsWith("-dv"))
        out(root.relativize(p).toString) =
          java.nio.file.Files.getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  test("widening the INT merge key to LONG moves no file, reads promote, " +
    "beyond-int keys merge in, and key pruning stays exact") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 10)
      val before = dataFiles(path)
      ManifestTable.widenColumn(spark, path, "id", LongType)
      assert(dataFiles(path) == before, "widening must move no data file")
      val m = ManifestTable.readManifest(spark, path)
      assert(m.schema("id").dataType == LongType)
      // reader promotes: values identical, type long
      val got = ManifestTable.read(spark, path)
      assert(got.schema("id").dataType == LongType)
      assert(got.agg(sum("id")).first().getLong(0) == (0L until 1000L).sum)
      // merge keys beyond Int.MaxValue
      val big = Seq((3_000_000_000L, 1L, 0.5f), (3_000_000_001L, 2L, 0.5f))
        .toDF("id", "cents", "ratio")
      ManifestTable.merge(spark, path, big)
      assert(ManifestTable.read(spark, path).count() == 1002L)
      // pruning with a long literal: only the appended file covers it
      val kept = ManifestTable.entriesWhere(spark,
        ManifestTable.readManifest(spark, path),
        col("id") >= 3_000_000_000L)
      assert(kept.size == 1)
      assert(ManifestTable.readWhere(spark, path,
        col("id") >= 3_000_000_000L).count() == 2L)
    } finally cleanup(path)
  }

  test("a CDF window spanning only the widening emits zero changes") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 4)
      val v0 = ManifestTable.readManifest(spark, path).version
      ManifestTable.widenColumn(spark, path, "id", LongType)
      val v1 = ManifestTable.readManifest(spark, path).version
      assert(ManifestTable.changesBetween(spark, path, v0, v1).count() == 0L)
      // time travel to the pre-widen version serves the narrow schema
      assert(ManifestTable.readAt(spark, path, v0)
        .schema("id").dataType == IntegerType)
    } finally cleanup(path)
  }

  test("deletion vectors written under the narrow key keep applying " +
    "after the widening (sidecar keys re-cast on read)") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 4)
      ManifestTable.deleteKeysDV(spark, path,
        df.filter(col("id") % 10 === 3).select("id"))
      ManifestTable.widenColumn(spark, path, "id", LongType)
      val got = ManifestTable.read(spark, path)
      assert(got.count() == 900L)
      assert(got.filter(col("id") % 10 === 3).count() == 0L)
      // and a post-widen dv delete composes
      ManifestTable.deleteKeysDV(spark, path,
        Seq(4L, 14L).toDF("id"))
      assert(ManifestTable.read(spark, path).count() == 898L)
    } finally cleanup(path)
  }

  test("restore past a key widening keeps the WIDE keyType (it must " +
    "agree with the kept current schema) and wide-key dv deletes still " +
    "work after the restore") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 4, keepVersions = 8)
      val v0 = ManifestTable.readManifest(spark, path).version
      ManifestTable.widenColumn(spark, path, "id", LongType)
      ManifestTable.merge(spark, path,
        Seq((3_000_000_000L, 1L, 0.5f)).toDF("id", "cents", "ratio"))
      // rewind CONTENT to pre-widen; the schema (and so the key's type)
      // stays current — a manifest carrying keyType=int against a long
      // schema would make the next dv commit cast wide keys down
      ManifestTable.restoreVersion(spark, path, v0)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.schema("id").dataType == LongType)
      assert(m.keyType == LongType,
        s"restored keyType must match the kept schema, got ${m.keyType}")
      assert(ManifestTable.read(spark, path).count() == 1000L)
      // a post-restore beyond-int merge + dv delete round-trips
      ManifestTable.merge(spark, path,
        Seq((4_000_000_000L, 2L, 0.5f)).toDF("id", "cents", "ratio"))
      ManifestTable.deleteKeysDV(spark, path, Seq(4_000_000_000L).toDF("id"))
      val got = ManifestTable.read(spark, path)
      assert(got.count() == 1000L)
      assert(got.filter(col("id") === 4_000_000_000L).count() == 0L)
    } finally cleanup(path)
  }

  test("float->double is refused for stats-bearing columns, allowed " +
    "otherwise; narrowing and unknown columns are refused") {
    val path = tmp()
    try {
      ManifestTable.create(df, path, "id", numFiles = 4,
        statsCols = Seq("ratio"))
      val e = intercept[IllegalArgumentException] {
        ManifestTable.widenColumn(spark, path, "ratio", DoubleType)
      }
      assert(e.getMessage.contains("unsound"))
      intercept[IllegalArgumentException] {
        ManifestTable.widenColumn(spark, path, "cents", IntegerType)
      }
      intercept[IllegalArgumentException] {
        ManifestTable.widenColumn(spark, path, "nope", LongType)
      }
    } finally cleanup(path)
    val path2 = tmp()
    try {
      // same shape but ratio NOT tracked -> widening allowed, promotes
      ManifestTable.create(df, path2, "id", numFiles = 4)
      ManifestTable.widenColumn(spark, path2, "ratio", DoubleType)
      val got = ManifestTable.read(spark, path2)
      assert(got.schema("ratio").dataType == DoubleType)
      assert(got.filter(col("id") === 1).first().getDouble(2) == 0.5d)
    } finally cleanup(path2)
  }
}
