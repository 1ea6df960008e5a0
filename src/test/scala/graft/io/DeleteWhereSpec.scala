package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** deleteWhere — predicate deletes with the three-tier cost model:
  * provably-covered files leave the manifest METADATA-ONLY (never
  * opened), possibly-matching files get deletion-vectored, ruled-out
  * files stay byte-identical. Results must equal SQL DELETE semantics
  * in every tier mix. */
class DeleteWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dw").toString + "/t"

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  // 1000 rows, 10 key-ranged files of 100; bucket = i/100 tracks the
  // file; prio cycles A/B/C with some nulls
  private def df: DataFrame =
    (0 until 1000).map(i => (i.toLong, i / 100,
      if (i % 11 == 0) null else s"${('A' + i % 3).toChar}"))
      .toDF("id", "bucket", "prio")

  private def make(path: String): Unit =
    ManifestTable.create(df, path, "id", numFiles = 10,
      statsCols = Seq("bucket", "prio"))

  private def dataFiles(path: String): Map[String, (Long, Long)] = {
    val root = java.nio.file.Paths.get(path)
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    java.nio.file.Files.walk(root).forEach { p =>
      val n = p.getFileName.toString
      // sidecar dirs (`…-dv/`) hold vectors, not data
      if (n.endsWith(".parquet") && p.toString.contains("/data/") &&
          !p.getParent.getFileName.toString.endsWith("-dv"))
        out(root.relativize(p).toString) =
          (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
    }
    out.toMap
  }

  test("key-range delete: covered files leave metadata-only, the boundary " +
    "file is vectored, untouched files stay byte-identical, and NO new " +
    "data txn is written") {
    val path = tmp()
    try {
      make(path)
      val before = dataFiles(path)
      val st = ManifestTable.deleteWhere(spark, path, col("id") < 350L)
      // files [0,100) [100,200) [200,300) proved covered; [300,400) partial
      assert(st.filesDropped == 3)
      assert(st.filesRepointed == 1)
      assert(st.deadMarked == 350L)
      val after = dataFiles(path)
      // dv sidecars are new, but not one DATA file was added or touched
      assert(after == before, "a predicate delete must write no data file")
      val got = ManifestTable.read(spark, path)
      assert(got.count() == 650L)
      assert(got.agg(min("id")).first().getLong(0) == 350L)
    } finally cleanup(path)
  }

  test("deadMarked counts only NEWLY killed rows: a covered file that " +
    "already carries a deletion vector contributes its LIVE count, not " +
    "its physical row count") {
    val path = tmp()
    try {
      make(path)
      // kill 30 of file [200,300)'s rows via a dv first
      val st0 = ManifestTable.deleteKeysDV(spark, path,
        (200L until 230L).toDF("id"))
      assert(st0.deadMarked == 30L)
      // now metadata-drop that whole file (plus [300,400) intact):
      // newly dead = 70 (the file's live remainder) + 100
      val st = ManifestTable.deleteWhere(spark, path,
        col("id") >= 200L && col("id") < 400L)
      assert(st.filesDropped == 2)
      assert(st.deadMarked == 170L,
        s"expected 70 live + 100, got ${st.deadMarked}")
      assert(ManifestTable.read(spark, path).count() == 800L)
    } finally cleanup(path)
  }

  test("stats-column predicates never metadata-drop (nulls could hide in " +
    "the range) but still prune reads and delete exactly the TRUE rows") {
    val path = tmp()
    try {
      make(path)
      val st = ManifestTable.deleteWhere(spark, path, col("bucket") === 2)
      // bucket 2 is exactly file 2 — whole file dies, but through the
      // sidecar (proved by pairs, not stats), so it reports as dropped
      // with its rows dead-marked
      assert(st.deadMarked == 100L)
      assert(ManifestTable.read(spark, path).count() == 900L)
      // null-prio rows must SURVIVE a prio predicate (SQL semantics)
      val st2 = ManifestTable.deleteWhere(spark, path, col("prio") === "A")
      val left = ManifestTable.read(spark, path)
      assert(left.filter(col("prio").isNull).count() ==
        df.filter(col("prio").isNull && col("bucket") =!= 2).count())
      assert(left.filter(col("prio") === "A").count() == 0L)
    } finally cleanup(path)
  }

  test("a 'c IS NOT NULL' CHECK constraint licenses metadata-only drops " +
    "on that stats column: covered files leave without a single data " +
    "read, and results still match SQL semantics") {
    val path = tmp()
    try {
      // same shape as make(), but bucket is constraint-guaranteed
      // non-null, so its [min,max] bounds EVERY row
      ManifestTable.create(df, path, "id", numFiles = 10,
        statsCols = Seq("bucket", "prio"),
        checkConstraints = Seq(("bucket_nn", "bucket IS NOT NULL")))
      val before = dataFiles(path)
      val st = ManifestTable.deleteWhere(spark, path, col("bucket") <= 2)
      assert(st.filesDropped == 3,
        s"files 0-2 are fully covered by bucket<=2, got $st")
      assert(st.filesRepointed == 0,
        "nothing partial: no file may be scanned or vectored")
      assert(st.deadMarked == 300L)
      assert(dataFiles(path) == before,
        "a fully-covered delete must write no data file")
      assert(ManifestTable.read(spark, path).count() == 700L)
      assert(ManifestTable.read(spark, path)
        .agg(min("bucket")).first().getInt(0) == 3)
    } finally cleanup(path)
  }

  test("the constraint is the license, not the stats: the same predicate " +
    "proves coverage only when 'bucket IS NOT NULL' is declared") {
    val unconstrained = tmp(); val constrained = tmp()
    try {
      make(unconstrained)
      ManifestTable.create(df, constrained, "id", numFiles = 10,
        statsCols = Seq("bucket", "prio"),
        checkConstraints = Seq(("bucket_nn", "bucket IS NOT NULL")))
      val cond = col("bucket") <= 2
      val (_, covered0) = ManifestTable.whereSets(spark,
        ManifestTable.readManifest(spark, unconstrained), cond)
      assert(covered0.isEmpty,
        "no proof without the constraint: nulls could hide in the range")
      val (_, covered1) = ManifestTable.whereSets(spark,
        ManifestTable.readManifest(spark, constrained), cond)
      assert(covered1.size == 3,
        s"constraint licenses the 3 fully-covered files, got $covered1")
      // a prio predicate still never proves (prio is nullable)
      val (_, covered2) = ManifestTable.whereSets(spark,
        ManifestTable.readManifest(spark, constrained),
        col("prio").isin("A", "B", "C"))
      assert(covered2.isEmpty)
    } finally { cleanup(unconstrained); cleanup(constrained) }
  }

  test("compound OR of key ranges covers both ends; the middle survives") {
    val path = tmp()
    try {
      make(path)
      val st = ManifestTable.deleteWhere(spark, path,
        col("id") < 200L || col("id") >= 800L)
      assert(st.filesDropped == 4) // files 0,1,8,9 — all proved covered
      assert(st.filesRepointed == 0)
      assert(st.deadMarked == 400L)
      val got = ManifestTable.read(spark, path)
      assert(got.count() == 600L)
      assert(got.agg(min("id"), max("id")).first() ==
        org.apache.spark.sql.Row(200L, 799L))
    } finally cleanup(path)
  }

  test("a predicate matching nothing burns no version; unknown column " +
    "fails loudly") {
    val path = tmp()
    try {
      make(path)
      val v0 = ManifestTable.readManifest(spark, path).version
      val st = ManifestTable.deleteWhere(spark, path, col("id") > 5000L)
      assert(st.version == v0 && st.deadMarked == 0L)
      assert(ManifestTable.readManifest(spark, path).version == v0)
      intercept[Exception] {
        ManifestTable.deleteWhere(spark, path, col("nope") === 1)
      }
    } finally cleanup(path)
  }

  test("CDF across a deleteWhere commit: exactly the deleted rows, as " +
    "deletes, covered-drop and vectored tiers alike; time travel still " +
    "reads the pre-delete state") {
    val path = tmp()
    try {
      make(path)
      val v0 = ManifestTable.readManifest(spark, path).version
      val st = ManifestTable.deleteWhere(spark, path, col("id") < 350L)
      val ch = ManifestTable.changesBetween(spark, path, v0, st.version)
      assert(ch.filter(col("_change_type") =!= "delete").count() == 0L)
      assert(ch.count() == 350L)
      assert(ch.agg(max("id")).first().getLong(0) == 349L)
      assert(ManifestTable.readAt(spark, path, v0).count() == 1000L)
    } finally cleanup(path)
  }

  test("partitioned table: a partition-column predicate metadata-drops " +
    "whole partitions (the retention shape) — purity makes it sound") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(df, path, "id", "bucket")
      val st = ManifestTable.deleteWhere(spark, path, col("bucket") < 3)
      // buckets 0,1,2 = 3 pure files: all dropped without a read
      assert(st.filesDropped == 3 && st.filesRepointed == 0)
      assert(st.deadMarked == 300L)
      val got = ManifestTable.read(spark, path)
      assert(got.count() == 700L)
      assert(got.agg(min("bucket")).first().getInt(0) == 3)
      // mixed: partition equality AND a row-level residual — the
      // partition conjunct covers nothing alone (the residual may be
      // false), so rows go through the vector, file-pruned to bucket 5
      val st2 = ManifestTable.deleteWhere(spark, path,
        col("bucket") === 5 && col("id") % 2 === 0L)
      assert(st2.filesDropped == 0 && st2.deadMarked == 50L)
      assert(ManifestTable.read(spark, path).count() == 650L)
    } finally cleanup(path)
  }

  test("deleteWhere composes with prior deletion vectors and with " +
    "column mapping (renamed key prunes and covers)") {
    val path = tmp()
    try {
      make(path)
      ManifestTable.deleteKeysDV(spark, path,
        df.filter(col("id") % 10 === 3).select("id"))
      ManifestTable.renameColumn(spark, path, "id", "doc_id")
      val st = ManifestTable.deleteWhere(spark, path, col("doc_id") < 500L)
      // 500 keys in range, but 50 were already dead via the earlier dv
      // — a re-delete of a dead row must not re-count
      assert(st.deadMarked == 450L)
      assert(st.filesDropped == 5)
      val got = ManifestTable.read(spark, path)
      assert(got.count() == 450L) // 500 survivors - 50 dv'd above 500
      assert(got.agg(min("doc_id")).first().getLong(0) >= 500L)
    } finally cleanup(path)
  }

  test("replaceWhere: delete-by-predicate + replacement in ONE atomic " +
    "commit — coverage drops ride along, re-inserted keys upsert, a " +
    "no-match predicate degrades to a plain insert") {
    val path = tmp()
    try {
      make(path)
      val v0 = ManifestTable.readManifest(spark, path).version
      // replace bucket < 3 (files 0-2 fully covered: metadata drops)
      // with 5 rows; key 100 existed in the replaced slice (upsert),
      // key 5000 is new
      val repl = Seq((100L, 0, "R"), (5000L, 1, "R"), (101L, 0, "R"),
        (250L, 2, "R"), (299L, 2, "R"))
        .toDF("id", "bucket", "prio")
      val st = ManifestTable.replaceWhere(spark, path,
        col("bucket") < 3, repl)
      val m1 = ManifestTable.readManifest(spark, path)
      assert(m1.version == v0 + 1, "ONE commit, no readable gap")
      assert(st.filesDropped >= 3, s"covered files drop metadata-only " +
        s"(got ${st.filesDropped})")
      val t = ManifestTable.read(spark, path)
      assert(t.count() == 700L + 5L)
      assert(t.filter(col("bucket") < 3).count() == 5L)
      assert(t.filter(col("id") === 100L).select("prio").as[String]
        .head() == "R", "re-inserted key carries the NEW image")
      assert(t.filter(col("id") === 500L).count() == 1L,
        "rows outside the predicate untouched")
      // history intact: the pre-replace snapshot still reads
      assert(ManifestTable.readAt(spark, path, v0).count() == 1000L)
      // no-match predicate + replacement = plain insert, one commit
      val st2 = ManifestTable.replaceWhere(spark, path,
        col("id") > 90000L, Seq((90001L, 9, "Z")).toDF("id", "bucket",
          "prio"))
      assert(st2.deadMarked == 0L)
      assert(ManifestTable.read(spark, path).count() == 706L)
    } finally cleanup(path)
  }
}
