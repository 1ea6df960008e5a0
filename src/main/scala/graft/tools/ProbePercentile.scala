package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: does Spark `percentile` match DuckDB `quantile_cont`? */
object ProbePercentile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    spark.sql("""SELECT l_returnflag,
      percentile(l_extendedprice, 0.25) p25,
      percentile(l_extendedprice, 0.5) p50,
      percentile(l_extendedprice, 0.75) p75
      FROM lineitem GROUP BY 1 ORDER BY 1""").show(false)
    spark.stop()
  }
}
