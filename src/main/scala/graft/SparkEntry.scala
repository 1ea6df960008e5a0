package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (A3 of SURVEY §2.5: grouped min/max by key+year,
    * reference flinkTableManipulation.scala:115) on sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("yr"))
      .agg(min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        count(lit(1)).as("cnt"))
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the non-SQL-expressible ops
    * (simhash / custom fingerprints / approximate IVF). */
  def oracleSql: Map[String, String] = Queries.oracles
}
