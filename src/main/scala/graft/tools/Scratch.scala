package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch runner (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. events ns-timestamp read
    try {
      val ev = graft.Queries.events(spark, "/root/testdata/sf0.001")
      ev.printSchema()
      ev.select(col("ts"), unix_timestamp(col("ts"))).show(3, false)
    } catch { case e: Throwable => println(s"EVENTS READ FAILED: ${e.getMessage.take(300)}") }

    // 2. custom expressions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import graft.functions.GraftFunctions._
    import graft.ext.TextAnalysis
    docs.select(col("doc_id"),
      simhash64(TextAnalysis.tokens(col("text"))).as("sh"),
      fingerprint64(TextAnalysis.tokens(col("text"))).as("fp")).show(3)

    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.as("a").join(emb.as("b"), col("a.vec_id") === 0 && col("b.vec_id") === 1)
      .select(cosine_sim(col("a.embedding"), col("b.embedding"))).show()

    // 3. top-k agg
    import graft.functions.TopKByScore.top_k_by
    val df = Seq((1L, 3.0), (2L, 5.0), (3L, 1.0), (4L, 4.0)).toDF("id", "s")
    df.agg(top_k_by(col("s"), col("id"), 2)).show(false)

    // 4. codegen check on simhash plan
    docs.select(simhash64(TextAnalysis.tokens(col("text")))).explain("codegen")
    spark.stop()
  }
}
