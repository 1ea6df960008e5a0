package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling join/aggregation utilities (extension layer, SURVEY §7.4
 * item 8). AQE's skew-join split handles most cases at runtime; these are
 * for the pathological hot keys AQE cannot split — a single key whose
 * rows exceed one task — and for skewed aggregations.
 */
object Joins {

  /**
   * Salted inner equi-join for a skewed big side: the big side gets a
   * deterministic salt in [0, saltFactor) derived from `saltSource` (any
   * row-distinguishing column, e.g. a line number or unique id), the small
   * side is replicated saltFactor times, and the join key becomes
   * (key, salt) — splitting each hot key across saltFactor reducers at the
   * cost of |small| × saltFactor replication.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, saltSource: Column): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val salted = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Two-phase (salted) aggregation for skewed group keys: partial
   * aggregate on (key, salt), then final aggregate on key. Works for any
   * algebraic aggregate; count and sum are provided as the common case.
   * (Catalyst's partial/final split already does this per-partition —
   * explicit salting additionally splits a hot key across REDUCERS.)
   */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltSource: Column, saltFactor: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(saltFactor)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__cnt").as("cnt"), sum("__sum").as(s"${valueCol}_sum"))
  }
}
