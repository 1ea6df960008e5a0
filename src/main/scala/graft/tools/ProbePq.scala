package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Dev probe: PQ recall@5 vs brute force across (m, ksub) and, for the
  * persisted IVF-PQ index, across nprobe — picks the declared-query
  * config and the PqSpec pin thresholds. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val qs = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, qs, 5)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
      for (ksub <- Seq(16, 64); res <- Seq(false, true)) {
        val idx = java.nio.file.Files.createTempDirectory("probe_pq").toString
        Similarity.buildPqIndex(emb, idx, numCentroids = 8, m = 16,
          ksub = ksub, residual = res)
        // bare ADC ordering (no re-rank) isolates the quantization error
        val bare = Similarity.pqTopKFromIndex(spark, idx, qs, 5, nprobe = 8)
          .as[(Long, Long, Double)].collect().map(r => (r._1, r._2))
        val bareRec = bare.count(brute.contains).toDouble / brute.size
        for (rr <- Seq(10, 20)) {
          val pq = Similarity.pqTopKFromIndexRerank(spark, idx, emb, qs, 5,
            rerank = rr, nprobe = 7)
            .as[(Long, Long, Double)].collect().map(r => (r._1, r._2))
          val recall = pq.count(brute.contains).toDouble / brute.size
          println(f"dir=$dir n=$n ivfpq res=$res m=16 ksub=$ksub bare=$bareRec%.3f np=7 rr=$rr recall@5=$recall%.3f")
        }
        graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(idx))
      }
    }
    spark.stop()
  }
}
