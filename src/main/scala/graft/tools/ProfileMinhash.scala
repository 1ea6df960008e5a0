package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ext.Dedup
import graft.functions.GraftFunctions

/** Dev-only: stage-by-stage timing of the MinHash-LSH dedup pipeline
  * (mirrors the current Dedup.minhashLshPairs structure). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val shingled = docs.select(
      col("doc_id").as("id"),
      GraftFunctions.shingle_set(
        GraftFunctions.tokens_lc(col("text")), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("id"), col("shingles"),
        GraftFunctions.minhash_sig(col("shingles"), 128).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("materialize shingles+sig")(println(shingled.count()))

    val banded = shingled.select(col("id"), posexplode(expr(
      "transform(sequence(0, 31), b -> xxhash64(slice(sig, b * 4 + 1, 4), b))")))
      .toDF("id", "band", "bkey")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("band + candidate join")(println(cand.count()))

    shingled.unpersist()
    time("full pipeline cold")(
      println(Dedup.minhashLshPairs(docs, numHashes = 128, bands = 32,
        threshold = 0.8).count()))
    spark.stop()
  }
}
