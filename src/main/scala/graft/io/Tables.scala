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

  /**
   * Small-file compaction: rewrite a parquet directory into
   * `ceil(bytes / targetFileBytes)` files. Streaming sinks and
   * fine-grained partition writes accumulate small files; at 100 TB the
   * resulting driver/namenode listing pressure and per-file task overhead
   * dominate read cost, so periodic compaction is part of operating the
   * store. Input size comes from the filesystem (no data pass); the
   * rewrite is one shuffle-free coalesce when shrinking file count, or a
   * round-robin repartition when growing it.
   */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val df = spark.read.parquet(inPath)
    val current = df.rdd.getNumPartitions
    val out = if (nFiles < current) df.coalesce(nFiles.toInt)
              else df.repartition(nFiles.toInt)
    out.write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /**
   * Data-skipping-friendly layout: range-partition on `sortCols` and sort
   * within each partition before writing. Parquet row-group min/max stats
   * on the sort columns then become tight and DISJOINT across files, so
   * point/range predicates skip whole files instead of scanning — the
   * batch analogue of clustering/Z-ordering on a single key prefix.
   */
  def writeSortedBy(df: DataFrame, path: String, numFiles: Int,
                    sortCols: String*): Unit = {
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }
}
