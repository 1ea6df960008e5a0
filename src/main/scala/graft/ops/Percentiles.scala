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
    ranked.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
