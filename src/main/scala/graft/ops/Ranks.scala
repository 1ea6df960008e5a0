package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact GLOBAL row numbering without a single-task total sort.
 *
 * An unpartitioned `Window.orderBy` funnels the whole table through one
 * task (`Exchange SinglePartition` → sort) — the classic scale-killer for
 * global ntile/percent_rank/cume_dist. The two-level bucketed-rank
 * pattern (same trick as [[Percentiles.exactPercentilesBucketed]] and the
 * pack-bins prefix sum) shards it exactly: global rank = (local
 * row_number within a monotone value-range bucket) + (count of rows in
 * all lower buckets). The row-level window partitions on the bucket —
 * parallelism = number of buckets — while the prefix offsets come from a
 * one-row-per-bucket counts table (metadata-sized; its own tiny global
 * window is over bucket COUNTS, not rows) broadcast back. Every global
 * rank function then derives arithmetically from the exact rank `__r`
 * and total `__n`.
 */
object Ranks {

  /**
   * Attach `__r` (exact 1-based global row_number over `order`) and `__n`
   * (total row count) to `df`. `bucket` must be a monotone non-decreasing
   * function of the leading sort key (e.g. `floor(value / step)`), so
   * every row in a lower bucket precedes every row in a higher one; ties
   * at bucket granularity are resolved by the full `order` within the
   * bucket. `order` must be a total order (unique key) for deterministic
   * ranks.
   */
  def withGlobalRank(df: DataFrame, order: Seq[Column], bucket: Column): DataFrame = {
    val base = df.withColumn("__b", bucket)
    val wLoc = Window.partitionBy("__b").orderBy(order: _*)
    val local = base.withColumn("__lr", row_number().over(wLoc).cast("long"))
    // one row per bucket: prefix-sum offsets + grand total, broadcast back
    val counts = base.groupBy("__b").agg(count(lit(1)).as("__c"))
    val wOff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = counts.select(col("__b"),
      coalesce(sum("__c").over(wOff), lit(0L)).as("__off"),
      sum("__c").over(wAll).as("__n"))
    local.join(broadcast(offs), "__b")
      .withColumn("__r", col("__lr") + col("__off"))
      .drop("__b", "__lr", "__off")
  }

  /**
   * Exact top-`limit` global ranks over (`cntCol` desc, ties by `order`)
   * WITHOUT ranking the full table. Bucketing alone does not fix a
   * Zipf-shaped `cntCol`: the cnt=1 bucket holds most distinct rows
   * (hapax legomena), so its window task still processes nearly the whole
   * table, and a post-rank `LIMIT` cannot be pushed below the window. The
   * exact pre-cut: a per-cnt histogram (`groupBy(cntCol).count` — at most
   * one row per distinct count value, metadata-sized) gives the largest
   * threshold at which the cumulative row count reaches `limit`; every
   * row with `cntCol >= threshold` is a prefix of the global
   * (cnt desc, …) order, so ranking ONLY those rows (boundary ties
   * included, trimmed by `__r <= limit` after) yields ranks identical to
   * ranking everything. The ranked set is ~`limit` rows regardless of
   * vocabulary size; the histogram's own cumulative window runs over
   * pre-aggregated one-row-per-count data.
   */
  def topKByCountDesc(df: DataFrame, cntCol: String, order: Seq[Column],
                      bucket: Column, limit: Long): DataFrame = {
    val hist = df.groupBy(cntCol).agg(count(lit(1)).as("__types"))
    val wCum = Window.orderBy(col(cntCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // count groups whose FIRST row still falls inside the top `limit`
    // (rows before the group < limit); the smallest such count value is
    // the exact keep threshold.
    val thr = hist
      .withColumn("__cum", sum("__types").over(wCum))
      .filter(col("__cum") - col("__types") < limit)
      .agg(min(col(cntCol)).as("__thr"))
    val pre = df.join(broadcast(thr), col(cntCol) >= col("__thr"))
      .drop("__thr")
    withGlobalRank(pre, order, bucket).filter(col("__r") <= limit)
  }
}
