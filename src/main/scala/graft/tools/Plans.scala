package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for key queries to review pushdown /
  * broadcast / codegen structure. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val names = if (args.nonEmpty && args(0) != "all") Seq(args(0))
      else Seq("p3_filter_symbols", "a2_sum_group", "a3_minmax_year",
        "j1_join_dims", "j3_join_big", "s1_topn", "ext_ann_brute")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
