package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ext.Dedup
import graft.functions.GraftFunctions

/** Dev-only: stage-by-stage timing of the MinHash-LSH dedup pipeline
  * (mirrors the current Dedup.minhashLshPairs structure: shared
  * shingle+sig scan → bandKeys → capped bucketPairs → exact-Jaccard
  * verify) plus parameter variants, with output-set equality checks
  * against the config of record (128 hashes × 32 bands). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // ---- stage breakdown at the config of record ----------------------
    def shingleOnly(): DataFrame = docs.select(
      col("doc_id").as("id"),
      GraftFunctions.shingle_set(
        GraftFunctions.tokens_lc(col("text")), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    def shingleSig(numHashes: Int): DataFrame = shingleOnly()
      .select(col("id"), col("shingles"),
        GraftFunctions.minhash_sig(col("shingles"), numHashes).as("sig"))

    time("stage: tokenize+shingle only (no sig)")(
      println(shingleOnly().write.format("noop").mode("overwrite").save()))
    val shingled = shingleSig(128).persist(StorageLevel.MEMORY_AND_DISK)
    time("stage: tokenize+shingle+sig128 materialize")(
      println(shingled.count()))

    def bandKeys(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
      val rows = numHashes / bands
      sig.select(col("id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rows + 1, $rows), b))")))
        .toDF("id", "band", "bkey")
    }
    def pairsOf(banded: DataFrame): DataFrame = {
      import graft.functions.BoundedMinIds.bounded_min_ids
      banded.groupBy("band", "bkey")
        .agg(bounded_min_ids(col("id"), 1000).as("bk"))
        .filter(col("bk.total") > 1)
        .select(col("bk.ids").as("ids"))
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids)),
            |            y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .distinct()
    }
    val cand = time("stage: band+bucket+pairs (warm sig)")(
      pairsOf(bandKeys(shingled, 128, 32))
        .persist(StorageLevel.MEMORY_AND_DISK))
    println(s"  candidates: ${cand.count()}")

    val sets = shingled.select(col("id"), col("shingles"))
    time("stage: exact-Jaccard verify (warm sig, warm cand)")(
      println(cand
        .join(sets.toDF("id_a", "sh_a"), Seq("id_a"))
        .join(sets.toDF("id_b", "sh_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.8).count()))
    cand.unpersist(); shingled.unpersist()

    // ---- cold end-to-end: config of record + variants ------------------
    def full(numHashes: Int, bands: Int): Set[(Long, Long)] =
      graft.ops.Caching.scoped {
        Dedup.minhashLshPairs(docs, numHashes = numHashes, bands = bands,
          shingleWords = 3, threshold = 0.8)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    var base = Set.empty[(Long, Long)]
    (1 to 3).foreach { i =>
      base = time(s"cold full 128x32 (run $i)")(full(128, 32))
    }
    println(s"  pairs: ${base.size}")
    for ((nh, b) <- Seq((64, 32), (64, 16), (48, 16), (96, 32), (128, 16))) {
      var out = Set.empty[(Long, Long)]
      (1 to 2).foreach { i =>
        out = time(s"cold full ${nh}x$b (run $i)")(full(nh, b))
      }
      println(s"  pairs: ${out.size}; identical to record: ${out == base}" +
        (if (out != base) s" (missing ${(base -- out).size}, extra ${(out -- base).size})" else ""))
    }
    spark.stop()
  }
}
