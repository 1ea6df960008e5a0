package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sort-based exact percentiles with linear interpolation
 * (`h = (n-1)p`, `v = v_lo·(1-frac) + v_hi·frac` — the exact FP shape
 * DuckDB's quantile_cont evaluates, so results are bit-identical;
 * Spark's own `percentile` computes `v_lo + (v_hi-v_lo)·frac`, which
 * differs in the last ulp for fractional positions).
 *
 * Spark's built-in exact `percentile` is a TypedImperativeAggregate that
 * buffers a value→count map per group — memory grows with distinct values
 * per group, an OOM risk for high-cardinality doubles at scale, and it is
 * off the codegen path. This implementation is one window sort over the
 * data (Spark's sort is external/spillable) plus a thin aggregate of at
 * most 2 rows per (group, percentile): bounded memory at any scale.
 */
object Percentiles {

  def exactPercentiles(df: DataFrame, keyCols: Seq[String], valueCol: String,
                       ps: Seq[Double]): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(valueCol))
    // group sizes via a pre-aggregated broadcast join: an unbounded
    // count-over-window would force a second full pass over the sorted
    // partition; the size table is one row per group (metadata-sized)
    val sizes = df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
    val ranked = df.join(broadcast(sizes), keyCols)
      .select(keys :+ col(valueCol) :+ col("__n") :+
        (row_number().over(w) - 1).as("__i"): _*)
    selectPercentiles(ranked, keyCols, valueCol, ps)
  }

  /**
   * Two-level variant for few/huge groups: the plain version's window
   * serializes each group into one task (fine for many groups, a 3-task
   * bottleneck when 3 groups hold the whole table). Here the global rank
   * within a group is (local rank within a value-range bucket) + (count
   * of rows in lower buckets): the row-level window partitions on
   * (group, bucket) — parallelism = groups × buckets — and the bucket
   * offsets come from a prefix sum over the metadata-sized counts table,
   * broadcast back. `bucketOf` must be a monotone non-decreasing function
   * of the value (e.g. `floor`); output is identical to exactPercentiles.
   */
  def exactPercentilesBucketed(df: DataFrame, keyCols: Seq[String],
                               valueCol: String, ps: Seq[Double])
                              (bucketOf: Column => Column): DataFrame = {
    val keys = keyCols.map(col)
    val bKeys = keyCols :+ "__b"
    val base = df.select(keys :+ col(valueCol) :+
      bucketOf(col(valueCol)).as("__b"): _*)
    val wLoc = Window.partitionBy(bKeys.map(col): _*).orderBy(col(valueCol))
    val local = base.withColumn("__lr", row_number().over(wLoc))
    val counts = base.groupBy(bKeys.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val wOff = Window.partitionBy(keys: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.select(bKeys.map(col) :+
      coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off") :+
      sum(col("__c")).over(Window.partitionBy(keys: _*)).as("__n"): _*)
    val ranked = local.join(broadcast(offs), bKeys)
      .select(keys :+ col(valueCol) :+ col("__n") :+
        (col("__lr") - 1 + col("__off")).as("__i"): _*)
    selectPercentiles(ranked, keyCols, valueCol, ps)
  }

  /** Shared tail: interpolate each requested percentile from the two
    * bracketing ranks — at most 2 contributing rows per (group, p). */
  private def selectPercentiles(ranked: DataFrame, keyCols: Seq[String],
                                valueCol: String, ps: Seq[Double]): DataFrame = {
    val aggs = ps.map { p =>
      val h = (col("__n") - 1) * lit(p)
      val lo = floor(h)
      val frac = h - lo
      val vLo = max(when(col("__i") === lo, col(valueCol)))
      val vHi = max(when(col("__i") === lo + 1, col(valueCol)))
      val f = max(frac)
      (vLo * (lit(1.0) - f) + coalesce(vHi, vLo) * f)
        .as(s"p${(p * 100).round}")
    }
    ranked.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
