package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** readWhere — automatic manifest-level file skipping from an arbitrary
  * predicate. The invariants: pruning decisions are SOUND (never drop a
  * file that could hold a matching row — unprunable shapes, stats-less
  * files and one-sided ORs all read conservatively) and EFFECTIVE (the
  * shapes the doc claims actually cut the file list, pinned through
  * entriesWhere). Results must equal the unpruned filter in every
  * case. */
class ReadWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rw").toString + "/t"

  private def cleanup(path: String): Unit =
    Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)

  // key-sorted on id → bucket (id/100) ranges align with files; name
  // prefixes A..J track the bucket for startsWith tests
  private def df: DataFrame =
    (0 until 1000).map(i =>
      (i.toLong, i / 100, s"${('A' + i / 100).toChar}_row$i"))
      .toDF("id", "bucket", "name")

  private def make(path: String): Unit =
    ManifestTable.create(df, path, "id", numFiles = 10,
      statsCols = Seq("bucket", "name"))

  private def keptFiles(path: String, cond: org.apache.spark.sql.Column): Int =
    ManifestTable.entriesWhere(spark,
      ManifestTable.readManifest(spark, path), cond).size

  test("key equality and key range prune to the covering files; results " +
    "match the unpruned filter") {
    val path = tmp()
    try {
      make(path)
      val c1 = col("id") === 250L
      assert(keptFiles(path, c1) <= 2)
      assert(ManifestTable.readWhere(spark, path, c1).count() == 1L)
      val c2 = col("id") >= 880L && col("id") < 920L
      assert(keptFiles(path, c2) <= 2)
      assert(ManifestTable.readWhere(spark, path, c2)
        .agg(sum("id")).first().getLong(0) == (880L until 920L).sum)
    } finally cleanup(path)
  }

  test("stats-column IN and OR-of-prunables prune; OR with an unprunable " +
    "side reads everything but still filters correctly") {
    val path = tmp()
    try {
      make(path)
      val cIn = col("bucket").isin(2, 7)
      assert(keptFiles(path, cIn) <= 4)
      assert(ManifestTable.readWhere(spark, path, cIn).count() == 200L)
      val cOr = col("bucket") === 1 || col("id") > 950L
      assert(keptFiles(path, cOr) <= 4)
      assert(ManifestTable.readWhere(spark, path, cOr).count() == 149L)
      // one OR side is a function of a column → no sound pruning
      val cMixed = col("bucket") === 1 || (col("id") % 500L === 0L)
      assert(keptFiles(path, cMixed) == 10)
      assert(ManifestTable.readWhere(spark, path, cMixed).count() == 102L)
    } finally cleanup(path)
  }

  test("unprunable conjuncts still narrow via their prunable partners; " +
    "untracked columns never prune") {
    val path = tmp()
    try {
      make(path)
      // bucket = 3 prunes; the UDF-ish modulo rides along as a filter
      val c = col("bucket") === 3 && col("id") % 2L === 1L
      assert(keptFiles(path, c) <= 2)
      assert(ManifestTable.readWhere(spark, path, c).count() == 50L)
      // NOT is unprunable by design (range negation is unsound here)
      assert(keptFiles(path, not(col("bucket") === 3)) == 10)
      assert(ManifestTable.readWhere(spark, path,
        not(col("bucket") === 3)).count() == 900L)
    } finally cleanup(path)
  }

  test("string startsWith prunes on the recorded name ranges") {
    val path = tmp()
    try {
      make(path)
      val c = col("name").startsWith("C_")
      assert(keptFiles(path, c) <= 2)
      assert(ManifestTable.readWhere(spark, path, c).count() == 100L)
    } finally cleanup(path)
  }

  test("startsWith at the surrogate boundary stays sound: a prefix " +
    "ending in \\uD7FF must not prune the files that hold its matches") {
    val path = tmp()
    try {
      // a per-CHAR bump of '퟿' yields the unpaired surrogate
      // '\uD800', whose UTF-8 form ('?') sorts BELOW the prefix — the
      // broken upper bound would prune every matching file
      val risky = "퟿"
      val names = (0 until 100).map(i =>
        (i.toLong, if (i < 50) s"$risky~row$i" else s"zz_row$i"))
        .toDF("id", "name")
      ManifestTable.create(names, path, "id", numFiles = 4,
        statsCols = Seq("name"))
      val c = col("name").startsWith(risky)
      assert(ManifestTable.readWhere(spark, path, c).count() == 50L,
        "surrogate-boundary prefix lost matching rows to pruning")
      // and the sane-prefix path still prunes (guard did not disable it)
      val kept = keptFiles(path, col("name").startsWith("zz_row9"))
      assert(kept < 4, s"ordinary startsWith stopped pruning ($kept kept)")
    } finally cleanup(path)
  }

  test("files without recorded stats for the referenced column are read " +
    "conservatively") {
    val path = tmp()
    try {
      // bucket tracked from the start, but the evolved column 'extra'
      // exists only in the post-evolution merge batch: old files carry
      // no stats for it and must never be pruned away
      ManifestTable.create(df.select("id", "bucket"), path, "id",
        numFiles = 5, statsCols = Seq("bucket"))
      ManifestTable.evolveSchema(spark, path, org.apache.spark.sql.types
        .StructType(Seq(org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.IntegerType))))
      // track it for NEW files via a merge (statsCols fixed at create:
      // 'extra' is not tracked, so every file is blind for it → a
      // predicate on it must keep all files)
      val c = col("extra") === 5
      assert(keptFiles(path, c) == 5)
      assert(ManifestTable.readWhere(spark, path, c).count() == 0L)
    } finally cleanup(path)
  }

  test("readWhere composes with column mapping: pruning works on a " +
    "RENAMED stats column and the renamed key") {
    val path = tmp()
    try {
      make(path)
      ManifestTable.renameColumn(spark, path, "bucket", "decile")
      ManifestTable.renameColumn(spark, path, "id", "doc_id")
      val c = col("decile") === 4 && col("doc_id") < 460L
      assert(keptFiles(path, c) <= 2)
      assert(ManifestTable.readWhere(spark, path, c).count() == 60L)
    } finally cleanup(path)
  }

  test("deletion vectors apply under readWhere (conservative ranges)") {
    val path = tmp()
    try {
      make(path)
      ManifestTable.deleteKeysDV(spark, path,
        (200L to 260L).toDF("id"))
      val c = col("id").between(180L, 280L)
      assert(ManifestTable.readWhere(spark, path, c).count() ==
        (280L - 180L + 1L) - (260L - 200L + 1L))
    } finally cleanup(path)
  }

  test("a partitioned table's partition column prunes through readWhere " +
    "(equality and IN), compounding with the key") {
    val path = tmp()
    try {
      ManifestTable.createPartitioned(df, path, "id", "bucket")
      val kIn = keptFiles(path, col("bucket").isin(3, 7))
      assert(kIn <= 2, s"partition IN kept $kIn files")
      assert(ManifestTable.readWhere(spark, path,
        col("bucket").isin(3, 7)).count() == 200L)
      val c = col("bucket") === 5 && col("id") >= 560L
      assert(keptFiles(path, c) <= 1)
      assert(ManifestTable.readWhere(spark, path, c).count() == 40L)
    } finally cleanup(path)
  }
}
