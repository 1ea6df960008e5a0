package graft.ext

import graft.SparkSpec

/** Exactly-once appends for the exact-digest index (EpochCommit over
  * `digests`) — completes the family: MinHash dedup, IVF ANN, and
  * exact-digest all share one epoch protocol. */
class ExactEpochSpec extends SparkSpec {
  import spark.implicits._

  test("exact-index epoch append: replay no-op, partial-promote " +
    "convergence, and compaction excludes an uncommitted epoch") {
    val idx = java.nio.file.Files.createTempDirectory("graft_xepoch")
    try {
      val base = Seq((0L, "alpha doc"), (1L, "beta doc")).toDF("doc_id", "text")
      Dedup.buildExactIndex(base, idx.toString, indexFiles = 1)
      def digests: Long = spark.read.parquet(
        graft.io.Tables.resolveComponent(spark, s"$idx/digests")).count()
      assert(digests == 2)

      val crawl = Seq((10L, "gamma doc"), (11L, "delta doc"))
        .toDF("doc_id", "text")
      assert(Dedup.appendToExactIndexEpoch(crawl, idx.toString, 3))
      assert(digests == 4)
      // committed replay: no-op
      assert(!Dedup.appendToExactIndexEpoch(crawl, idx.toString, 3))
      assert(digests == 4)

      // crash between promote and marker: replay converges, no doubling
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$idx/_epochs/stream-3"))
      assert(Dedup.appendToExactIndexEpoch(crawl, idx.toString, 3))
      assert(digests == 4, "partial-promote replay double-appended")

      // compaction racing the downed stream: uncommitted files excluded,
      // replay re-lands them in the new version
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$idx/_epochs/stream-3"))
      Dedup.compactExactIndex(spark, idx.toString, indexFiles = 1)
      assert(digests == 2, "compaction folded an uncommitted epoch")
      assert(Dedup.appendToExactIndexEpoch(crawl, idx.toString, 3))
      assert(digests == 4)
      // the probe path agrees: the replayed digests dedup a new crawl
      val probe = Dedup.exactSurvivorsAgainstIndex(
        Seq((20L, "gamma doc"), (21L, "epsilon doc")).toDF("doc_id", "text"),
        idx.toString)
      assert(probe.select("doc_id").as[Long].collect().toSet == Set(21L))
    } finally graft.io.Fs.deleteRecursively(idx)
  }
}
