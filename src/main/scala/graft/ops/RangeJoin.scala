package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Banded range join: pairs (left, right) with equal `key` and
 * `rightTime ∈ [leftTime + lower, leftTime + upper]` (times are
 * non-negative longs on one scale, e.g. epoch nanoseconds).
 *
 * A naive range-condition join degenerates to a per-key cartesian product
 * before filtering. Here each left row is replicated across the time
 * buckets its window covers and each right row lands in exactly one
 * bucket, so the equi-join on (key, bucket) touches only candidate pairs
 * — replication factor is `(upper-lower)/bucketSize + 1` (≤ 2 at the
 * default bucket size) and each qualifying pair appears exactly once (no
 * dedup pass needed).
 */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTimeCol: String, rightTimeCol: String,
                lower: Long, upper: Long,
                bucketSize: Long = 0L): DataFrame = {
    require(upper >= lower, "upper must be >= lower")
    val overlap = (left.columns.toSet - key).intersect(right.columns.toSet - key)
    require(overlap.isEmpty,
      s"rename columns shared by both sides (except the key) first: $overlap")
    val b = if (bucketSize > 0) bucketSize else math.max(upper - lower, 1L)
    val lb = left.withColumn("__bucket", explode(expr(
      s"sequence(($leftTimeCol + ${lower}L) DIV ${b}L, ($leftTimeCol + ${upper}L) DIV ${b}L)")))
    val rb = right.withColumn("__bucket", expr(s"$rightTimeCol DIV ${b}L"))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(expr(s"$rightTimeCol >= $leftTimeCol + ${lower}L AND " +
        s"$rightTimeCol <= $leftTimeCol + ${upper}L"))
      .drop("__bucket")
  }
}
