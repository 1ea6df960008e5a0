package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: formatted physical plans of the queries named in args
  * (default: the round's new ones) at sf0.001. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("ext_scrub_pii", "ext_chunk_docs", "ext_repetition",
        "ext_sample_stratified", "s19_distribution")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .explain("formatted")
    }
    spark.stop()
  }
}
