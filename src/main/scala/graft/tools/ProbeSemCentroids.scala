package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ext.Similarity

/** Dev probe: train the fixed SemDeDup centroid table (k=8, 2 Lloyd
  * iterations, sf0.01 embeddings) and print it as the Scala literal baked
  * into Queries.SemCentroids. Re-run whenever the model is regenerated;
  * also reports the within-cluster pair count per SF so the declared
  * query stays discriminative. */
object ProbeSemCentroids {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = Similarity.trainCentroids(emb, numCentroids = 8, kmeansIters = 2)
    println("  private[graft] val SemCentroids: Array[Array[Float]] = Array(")
    cents.foreach { c =>
      println("    Array(" + c.map(v => s"${v}f").mkString(", ") + "),")
    }
    println("  )")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val pairs = Similarity.semanticDedupPairs(e, cents, threshold = 0.4)
      val perCluster = Similarity.semanticClusters(e, cents)
        .groupBy("cluster").count().orderBy("cluster")
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"dir=$dir pairs=${pairs.count()} clusterSizes=$perCluster")
    }
    spark.stop()
  }
}
