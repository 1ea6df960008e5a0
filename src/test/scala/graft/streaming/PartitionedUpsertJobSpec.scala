package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.io.ManifestTable
import graft.jobs.StreamingUpsertJob

/** Streaming CDC into a PARTITIONED manifest table: the job's merge /
  * applyChanges micro-batches must preserve the partition-pure file
  * invariant (every written file holds one partition value), so the
  * metadata-only partition ops — drop, pruned read, inventory — keep
  * working on a table that is continuously ingested. The partitioned
  * layout is the 100 TB fact-table shape; CDC ingestion is how it is
  * fed, so the two features have to compose. */
class PartitionedUpsertJobSpec extends SparkSpec {
  import spark.implicits._

  private def drop(root: String, name: String, df: DataFrame): Unit = {
    df.coalesce(1).write.parquet(s"$root/stage_$name")
    scala.util.Using.resource(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/stage_$name")))(
      _.filter(_.toString.endsWith(".parquet"))
        .forEach(f => java.nio.file.Files.move(f,
          java.nio.file.Paths.get(s"$root/watch/$name.parquet"))))
  }

  private def content(path: String): Set[(Long, String, String)] =
    ManifestTable.read(spark, path)
      .as[(Long, String, String)].collect().toSet

  /** Every manifest entry partition-pure on pt. */
  private def assertPure(path: String): Unit = {
    val m = ManifestTable.readManifest(spark, path)
    assert(m.partCols.contains("pt"))
    m.entries.foreach { e =>
      val (mn, mx) = e.extra("pt")
      assert(mn == mx, s"file ${e.relPath} spans [$mn,$mx] — a streaming " +
        "merge broke partition purity")
    }
  }

  private def baseRows: Seq[(Long, String, String)] =
    (0L until 30L).map(i => (i, s"p${i % 3}", s"v$i"))

  test("streaming upserts into a partitioned table keep partition " +
    "purity; untouched partitions are carried by reference and " +
    "metadata-only drop still works afterwards") {
    val root = java.nio.file.Files.createTempDirectory("graft_pups").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"
    def run(): Unit = {
      // schemaDdl=None: the job reads the schema off the existing
      // partitioned table's manifest — the production wiring
      val q = StreamingUpsertJob.start(spark, s"$root/watch", table, "id",
        s"$root/ckpt", schemaDdl = None, numFiles = 2)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      ManifestTable.createPartitioned(
        baseRows.toDF("id", "pt", "v"), table, "id", "pt")
      val p2Before = ManifestTable.readManifest(spark, table).entries
        .filter(_.extra("pt")._1 == "p2").map(_.relPath).toSet

      // batch 1 touches p0 (update) and p1 (new key); p2 untouched
      drop(root, "b1",
        Seq((0L, "p0", "upd"), (100L, "p1", "new")).toDF("id", "pt", "v"))
      run()
      val expect = baseRows.toSet - ((0L, "p0", "v0")) +
        ((0L, "p0", "upd")) + ((100L, "p1", "new"))
      assert(content(table) == expect)
      assertPure(table)

      // a batch spanning SEVERAL partitions in one micro-batch still
      // lands partition-pure (the merge write splits it per value)
      drop(root, "b2", Seq((1L, "p1", "u1"), (2L, "p2", "u2"),
        (101L, "p0", "n")).toDF("id", "pt", "v"))
      run()
      assertPure(table)
      val expect2 = expect - ((1L, "p1", "v1")) - ((2L, "p2", "v2")) +
        ((1L, "p1", "u1")) + ((2L, "p2", "u2")) + ((101L, "p0", "n"))
      assert(content(table) == expect2)

      // p2 was untouched by b1: b1's commit carried its files verbatim
      // (b2 then rewrote one of them — so assert against the b1 commit)
      val vB1 = ManifestTable.latestVersion(spark, table).get - 1
      val p2AtB1 = ManifestTable.readManifestAt(spark, table, vB1).entries
        .filter(_.extra("pt")._1 == "p2").map(_.relPath).toSet
      assert(p2AtB1 == p2Before,
        "a streaming merge must not rewrite partitions it doesn't touch")

      // the table remains fully partition-operable: metadata-only drop
      val st = ManifestTable.deletePartitions(spark, table, Seq("p1"))
      assert(st.filesRewritten == 0 && st.filesWritten == 0,
        s"drop after streaming ingest must stay metadata-only, got $st")
      assert(content(table) == expect2.filterNot(_._2 == "p1"))
    } finally graft.io.Fs.deleteRecursively(
      java.nio.file.Paths.get(root))
  }

  test("cdf stream into a partitioned table: post-images upsert, " +
    "deletes delete, purity and pruned reads hold") {
    val root = java.nio.file.Files.createTempDirectory("graft_pupc").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val table = s"$root/table"
    def run(): Unit = {
      val q = StreamingUpsertJob.start(spark, s"$root/watch", table, "id",
        s"$root/ckpt", schemaDdl = None, numFiles = 2, cdf = true)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      ManifestTable.createPartitioned(
        baseRows.toDF("id", "pt", "v"), table, "id", "pt")

      drop(root, "c1", Seq(
        ("update_post", 3L, "p0", "u3"),
        ("delete", 4L, "p1", "v4"),
        ("insert", 102L, "p2", "n2")).toDF("_change_type", "id", "pt", "v"))
      run()
      val expect = baseRows.toSet - ((3L, "p0", "v3")) - ((4L, "p1", "v4")) +
        ((3L, "p0", "u3")) + ((102L, "p2", "n2"))
      assert(content(table) == expect)
      assertPure(table)

      // pruned read cuts driver-side to the requested partition and
      // reflects the CDC state
      val p2 = ManifestTable.readPartitions(spark, table, Seq("p2"))
        .as[(Long, String, String)].collect().toSet
      assert(p2 == expect.filter(_._2 == "p2"))
    } finally graft.io.Fs.deleteRecursively(
      java.nio.file.Paths.get(root))
  }
}
