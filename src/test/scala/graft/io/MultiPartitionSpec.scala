package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** MULTI-LEVEL partitioning — `createPartitioned(df, path, key,
  * Seq(date, src))` lays out nested partition directories; every file
  * is pure on EVERY level. Invariants: value-addressed ops address the
  * LEADING column (drop/compact/read a whole date), dynamic overwrite
  * replaces exact value TUPLES, every mutation re-establishes purity on
  * all levels, and the connector exposes BOTH columns as real Spark
  * partition columns (static pruning + DPP each). */
class MultiPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mp").toString + "/t"

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  // 3 dates x 3 sources x 40 rows
  private def df: DataFrame =
    (0 until 360).map { i =>
      (i.toLong, s"d${i % 3}", s"s${(i / 3) % 3}", i * 10L)
    }.toDF("id", "date", "src", "v")

  private def make(path: String): Unit =
    ManifestTable.createPartitioned(df, path, "id", Seq("date", "src"),
      Seq.empty, None, 2, 0, Seq.empty)

  private def purity(path: String): Unit = {
    val m = ManifestTable.readManifest(spark, path)
    m.entries.foreach { e =>
      Seq("date", "src").foreach { c =>
        val (mn, mx) = e.extra(c)
        assert(mn == mx, s"${e.relPath} mixes '$c' values [$mn,$mx]")
      }
    }
  }

  test("create: nested layout, purity on both levels, manifest " +
    "roundtrips partCols; reads equal the input") {
    val path = tmp()
    try {
      make(path)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.partCols == Seq("date", "src"))
      assert(m.entries.size == 9, s"one file per (date, src) cell: " +
        s"${m.entries.size}")
      purity(path)
      assert(ManifestTable.read(spark, path).count() == 360L)
      assert(ManifestTable.read(spark, path)
        .agg(sum("v")).first().getLong(0) ==
        (0 until 360).map(_ * 10L).sum)
    } finally cleanup(path)
  }

  test("value-addressed ops: deletePartitions drops a whole leading " +
    "slice metadata-only; readPartitions cuts driver-side; " +
    "compactPartitions rewrites only the hot date") {
    val path = tmp()
    try {
      make(path)
      val st = ManifestTable.deletePartitions(spark, path, Seq("d1"))
      assert(st.filesRewritten == 0 && st.filesWritten == 0)
      assert(ManifestTable.read(spark, path)
        .filter(col("date") === "d1").count() == 0L)
      assert(ManifestTable.read(spark, path).count() == 240L)
      purity(path)
      assert(ManifestTable.readPartitions(spark, path, Seq("d0"))
        .count() == 120L)
      val st2 = ManifestTable.compactPartitions(spark, path, Seq("d2"))
      assert(st2.filesRewritten == 3, s"only d2's files: ${st2}")
      purity(path)
      assert(ManifestTable.read(spark, path).count() == 240L)
    } finally cleanup(path)
  }

  test("dynamic overwritePartitions replaces exact (date, src) TUPLES; " +
    "untouched cells carried by reference") {
    val path = tmp()
    try {
      make(path)
      // backfill one cell: (d0, s1) becomes 2 rows
      val repl = Seq((9000L, "d0", "s1", 1L), (9001L, "d0", "s1", 2L))
        .toDF("id", "date", "src", "v")
      val st = ManifestTable.overwritePartitions(spark, path, repl)
      assert(st.filesWritten == 1)
      val t = ManifestTable.read(spark, path)
      assert(t.filter(col("date") === "d0" && col("src") === "s1")
        .count() == 2L)
      assert(t.filter(col("date") === "d0" && col("src") === "s0")
        .count() == 40L, "sibling cell untouched")
      assert(t.count() == 360L - 40L + 2L)
      purity(path)
    } finally cleanup(path)
  }

  test("merge and deleteWhere re-establish purity on both levels; " +
    "partition-column rename carries partCols") {
    val path = tmp()
    try {
      make(path)
      ManifestTable.merge(spark, path,
        Seq((5000L, "d9", "s9", 7L), (0L, "d0", "s0", 777L))
          .toDF("id", "date", "src", "v"))
      purity(path)
      val t = ManifestTable.read(spark, path)
      assert(t.count() == 361L)
      assert(t.filter(col("id") === 0L).select("v").as[Long].head() == 777L)
      ManifestTable.deleteWhere(spark, path, col("v") === 7L)
      assert(ManifestTable.read(spark, path).count() == 360L)
      ManifestTable.renameColumn(spark, path, "src", "source")
      val m = ManifestTable.readManifest(spark, path)
      assert(m.partCols == Seq("date", "source"))
      assert(ManifestTable.read(spark, path)
        .filter(col("source") === "s1").count() == 120L)
    } finally cleanup(path)
  }

  test("connector: BOTH levels are real Spark partition columns — " +
    "static pruning on either, DPP on the second") {
    val path0 = tmp()
    val root = java.nio.file.Paths.get(path0).getParent.toString
    val path = path0
    try {
      make(path)
      def load() = spark.read.format("graft").load(path)
      def scanFiles(q: DataFrame): Long = {
        q.collect()
        q.queryExecution.executedPlan.collectFirst {
          case s: FileSourceScanExec => s
        }.get.metrics("numFiles").value
      }
      val rel = load()
      assert(rel.schema.fieldNames.toSeq == Seq("id", "date", "src", "v"))
      // static pruning: leading column cuts to its 3 cells
      val q1 = load().filter(col("date") === "d1")
      assert(scanFiles(q1) == 3L, "leading-level static pruning")
      assert(q1.count() == 120L)
      // static pruning on the SECOND level alone
      val q2 = load().filter(col("src") === "s2")
      assert(scanFiles(q2) == 3L, "second-level static pruning")
      assert(q2.count() == 120L)
      // both levels: one cell
      val q3 = load().filter(col("date") === "d0" && col("src") === "s0")
      assert(scanFiles(q3) == 1L, "two-level static pruning")
      assert(q3.count() == 40L)
      // DPP through a dim join on the SECOND column (a selective
      // dim-side filter over a scannable source — the rule's
      // hasSelectivePredicate shape)
      Seq(("s0", "drop"), ("s1", "keep"), ("s2", "drop"))
        .toDF("s", "tag").write.mode("overwrite").parquet(s"$root/dim")
      val dim = spark.read.parquet(s"$root/dim")
        .filter(col("tag") === "keep").select("s")
      val j = load().join(broadcast(dim), col("src") === col("s"))
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"no DPP subquery on the second level:\n${planStr.take(2000)}")
      assert(j.count() == 120L)
    } finally cleanup(path)
  }

  test("SQL on a two-level table: INSERT with a full static PARTITION " +
    "spec, and INSERT OVERWRITE PARTITION of a leading slice") {
    val path = tmp()
    try {
      make(path)
      spark.sql(s"CREATE TABLE mp_t USING graft " +
        s"OPTIONS (path '$path', key 'id')")
      try {
        spark.sql("INSERT INTO mp_t PARTITION (date='d0', src='s0') " +
          "VALUES (8000, 55)")
        assert(ManifestTable.read(spark, path).filter(col("id") === 8000L)
          .select("date", "src", "v").as[(String, String, Long)]
          .head() == (("d0", "s0", 55L)))
        purity(path)
        // leading-slice overwrite: PARTITION (date='d2') replaces every
        // d2 source with the new rows
        spark.sql("INSERT OVERWRITE mp_t PARTITION (date='d2') " +
          "VALUES (8100, 's0', 1), (8101, 's1', 2)")
        val d2 = ManifestTable.read(spark, path)
          .filter(col("date") === "d2")
        assert(d2.count() == 2L)
        assert(d2.select("id").as[Long].collect().sorted.toSeq ==
          Seq(8100L, 8101L))
        purity(path)
        // plain INSERT with the partition values in the row
        spark.sql("INSERT INTO mp_t VALUES (8200, 'd1', 's2', 9)")
        assert(ManifestTable.read(spark, path)
          .filter(col("id") === 8200L).count() == 1L)
        purity(path)
        // bare DELETE (truncate) of a two-level table: one empty
        // overwrite commit, layout claim survives, refills cleanly
        spark.sql("DELETE FROM mp_t")
        assert(spark.table("mp_t").count() == 0L)
        assert(ManifestTable.readManifest(spark, path).partCols ==
          Seq("date", "src"))
        spark.sql("INSERT INTO mp_t VALUES (1, 'd0', 's0', 1)")
        assert(spark.table("mp_t").count() == 1L)
        purity(path)
      } finally spark.sql("DROP TABLE IF EXISTS mp_t")
    } finally cleanup(path)
  }

  test("deletePartitionValues drops a NON-LEADING value across all " +
    "leading slices, metadata-only; leading level and unknown values " +
    "behave like deletePartitions") {
    val path = tmp()
    try {
      make(path)
      val m0 = ManifestTable.readManifest(spark, path)
      // drop source s1 across ALL dates — per-level purity makes it a
      // manifest-only commit
      val st = ManifestTable.deletePartitionValues(spark, path, "src",
        Seq("s1"))
      assert(st.filesRewritten == 0 && st.filesWritten == 0,
        "value drop must be metadata-only")
      val m1 = ManifestTable.readManifest(spark, path)
      assert(m1.version == m0.version + 1)
      val t = ManifestTable.read(spark, path)
      assert(t.filter(col("src") === "s1").count() == 0L)
      assert(t.count() == 240L, "other sources' rows intact")
      assert(t.select("date").distinct().count() == 3L,
        "every date survives — the drop addressed the src level")
      purity(path)
      // the LEADING level works through the same op
      ManifestTable.deletePartitionValues(spark, path, "date", Seq("d0"))
      assert(ManifestTable.read(spark, path)
        .filter(col("date") === "d0").count() == 0L)
      // unknown value burns no version; unknown column refuses loudly
      val v = ManifestTable.readManifest(spark, path).version
      ManifestTable.deletePartitionValues(spark, path, "src", Seq("nope"))
      assert(ManifestTable.readManifest(spark, path).version == v)
      val e = intercept[Exception] {
        ManifestTable.deletePartitionValues(spark, path, "v", Seq("1"))
      }
      assert(e.getMessage.contains("not a partition column"))
    } finally cleanup(path)
  }

  test("writer option partCol accepts a comma-separated multi-level " +
    "spec") {
    val path = tmp()
    try {
      df.write.format("graft").option("key", "id")
        .option("partCol", "date,src").mode("overwrite").save(path)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.partCols == Seq("date", "src"))
      assert(spark.read.format("graft").load(path).count() == 360L)
      purity(path)
    } finally cleanup(path)
  }
}
