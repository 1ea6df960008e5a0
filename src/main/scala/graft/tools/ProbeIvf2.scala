package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Dev probe: IVF recall@5 at sf0.01 (the driver-gate SF) across configs. */
object ProbeIvf2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val qs = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, qs, 5)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
      for (nc <- Seq(8); np <- Seq(6, 7); it <- Seq(2, 4)) {
        val ivf = Similarity.ivfTopK(emb, qs, 5, numCentroids = nc,
          nprobe = np, kmeansIters = it).as[(Long, Long, Double)].collect()
          .map(r => (r._1, r._2))
        val recall = ivf.count(brute.contains).toDouble / brute.size
        println(f"dir=$dir n=$n nc=$nc np=$np it=$it recall@5=$recall%.3f")
      }
    }
    spark.stop()
  }
}
