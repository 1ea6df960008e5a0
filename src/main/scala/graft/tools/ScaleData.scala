package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Cross-scale stress data: derive an sf1-equivalent dataset (~6M
 * lineitem) from the driver's sf0.1 parquet by key-strided replication
 * — referential integrity preserved (each copy's orders reference that
 * copy's customers, etc.), schemas identical to TESTDATA.md's, fully
 * deterministic (no RNG). Documents get a per-copy word-suffix
 * mutation so copies share NO shingles: intra-copy near-dup structure
 * is preserved exactly (both sides of a pair mutate identically) while
 * cross-copy pairs — an artifact of replication, not of the corpus —
 * cannot explode the LSH candidate sets. Embeddings replicate
 * verbatim under fresh ids (identical vectors tie-break on id, which
 * the determinism rules already require). The driver's own tables are
 * never modified; output goes to a scratch dir.
 *
 * Usage: runMain graft.tools.ScaleData [srcDir] [dstDir] [copies]
 */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).first().getLong(0) + 1L
    val custS = stride(t("customer"), "c_custkey")
    val suppS = stride(t("supplier"), "s_suppkey")
    val partS = stride(t("part"), "p_partkey")
    val ordS = stride(t("orders"), "o_orderkey")
    val evtS = stride(t("events").select(col("event_id")), "event_id")
    val docS = stride(t("documents"), "doc_id")
    val vecS = stride(t("embeddings"), "vec_id")

    /** Union `copies` transformed replicas (k = 0 is the identity). */
    def scaled(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(k => f(df, k)).reduce(_ unionByName _)

    def write(name: String, df: DataFrame, files: Int): Unit = {
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
      println(s"  $name: written")
    }

    write("region", t("region"), 1)
    write("nation", t("nation"), 1)
    write("customer", scaled(t("customer")) { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(k * custS)) }, 4)
    write("supplier", scaled(t("supplier")) { (df, k) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(k * suppS)) }, 2)
    write("part", scaled(t("part")) { (df, k) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(k * partS)) }, 4)
    write("orders", scaled(t("orders")) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * ordS))
        .withColumn("o_custkey", col("o_custkey") + lit(k * custS)) }, 8)
    write("lineitem", scaled(t("lineitem")) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * ordS))
        .withColumn("l_partkey", col("l_partkey") + lit(k * partS))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * suppS)) }, 16)
    write("events", scaled(t("events")) { (df, k) =>
      df.withColumn("event_id", col("event_id") + lit(k * evtS)) }, 8)
    // suffix WITHOUT a separator: "word~k" tokenizes ([^a-z0-9]+ split)
    // as TWO tokens with the digit interleaved between every word, which
    // collapses half of all shingles onto unigram document frequencies —
    // the df-cut then binds corpus-wide and the capped n-gram operators
    // diverge from their uncapped SQL replays (round-11 sf1 finding).
    // "wordk" stays ONE token: copies share no shingles AND every df
    // class is exactly copy-0's.
    write("documents", scaled(t("documents")) { (df, k) =>
      val mutated =
        if (k == 0) df
        else df
          .withColumn("text", array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"$k"))), " "))
          .withColumn("n_chars", length(col("text")).cast("long"))
      mutated.withColumn("doc_id", col("doc_id") + lit(k * docS)) }, 4)
    // per-copy DIMENSION ROTATION (an orthogonal transform): intra-copy
    // cosines are exactly copy-0's, so ANN/near-dup structure replicates,
    // while cross-copy pairs decohere — verbatim replication instead
    // creates 10-cliques of IDENTICAL vectors whose all-pairs mass
    // overflows LSH bucket caps (the other round-11 sf1 finding)
    write("embeddings", scaled(t("embeddings")) { (df, k) =>
      val rotated =
        if (k == 0) df
        else {
          val dim = 64
          val idx = (0 until dim).map(i => (i + k) % dim)
          df.withColumn("embedding",
            array(idx.map(i => col("embedding").getItem(i)): _*))
        }
      rotated.withColumn("vec_id", col("vec_id") + lit(k * vecS)) }, 4)
    println(s"done: $dst (x$copies of $src)")
    spark.stop()
  }
}
