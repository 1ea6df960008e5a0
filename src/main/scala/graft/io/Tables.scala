package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table management for co-located joins (SURVEY §7.4 item 8:
 * "joins must be key-partitioned"). Writing both fact tables bucketed by
 * the join key with the same bucket count lets Spark join them with NO
 * shuffle exchange on either side — at 100 TB that removes the single
 * largest network cost of a fact-fact join. Bucket counts should be sized
 * so a bucket fits in one task (rows/buckets × row width ≲ task memory).
 */
object Tables {

  /** Persist `df` as a bucketed (and bucket-sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free when
    * bucket counts match (verify with `.explain`: no Exchange). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /**
   * Day-partitioned event layout: `path/<dateCol>=yyyy-MM-dd/part-*.parquet`.
   * Date-range predicates then prune at the DIRECTORY level
   * (`PartitionFilters` in the scan) — on a 100 TB event store, a one-day
   * query reads one day, not 100 TB. `maxRecordsPerFile` bounds part sizes
   * (the K2 rolling-policy knob generalized to batch layout).
   */
  def writeDayPartitioned(df: DataFrame, path: String, tsCol: String,
                          dateCol: String = "event_date",
                          maxRecordsPerFile: Long = 5000000): Unit =
    df.withColumn(dateCol, org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col(tsCol)))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(dateCol)
      .parquet(path)
}
