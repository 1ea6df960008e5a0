package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join (point-in-time join): for each left row, attach the latest
 * right row with `rightTime <= leftTime` for the same key. Spark has no
 * native operator; a range-condition join explodes to O(|left|·|right|)
 * per key before picking the max. This implementation composes existing
 * operators (preference (a) of the custom-operator ladder): tag both
 * sides, union, and carry right values forward with
 * `last(_, ignoreNulls)` over a (key, time)-ordered window — one shuffle
 * per side, no pair explosion, O(1) state per row. The window sort also
 * makes ties deterministic: right rows sort before left rows at equal
 * time (<= semantics), and equal-time right rows resolve by `rightOrd`.
 */
object AsofJoin {

  /**
   * @param left      left (probe) side
   * @param right     right (reference) side
   * @param key       equi-join key column name (same name both sides)
   * @param leftTime  left event-time column (orderable; same type scale as rightTime)
   * @param rightTime right event-time column
   * @param rightCols right value columns to attach
   * @param rightOrd  deterministic tie-break among equal-time right rows
   *                  (e.g. a right-side id; highest wins)
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: Column, rightTime: Column,
               rightCols: Seq[String], rightOrd: Column): DataFrame = {
    val (unioned, leftCols) =
      unionTagged(left, right, key, leftTime, rightTime, rightCols, rightOrd)

    // right rows (side 0) sort before left rows at equal __t → "<=" semantics
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // carry the latest right row as ONE struct — per-column carries could
    // mix values from different right rows when right columns hold nulls
    val rstruct = when(col("__side") === 0, struct(rightCols.map(col): _*))
    val carried = unioned.withColumn("__r", last(rstruct, ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /**
   * Hot-key-hardened as-of join, result-identical to [[asofJoin]]: when a
   * single key's history exceeds one task (the plain variant's window
   * serializes each key), split the timeline with `bucketOf` (a
   * monotonic time → bucket-id mapping, e.g. `t => floor over a day`)
   * and resolve in two levels — the row-level window partitions on
   * (key, bucket) so a hot key parallelizes across its buckets, and
   * cross-bucket carry-in comes from a per-(key, bucket) "latest right
   * row" table (one row per bucket — metadata-sized) prefix-carried over
   * buckets. Struct-level coalesce keeps right-row atomicity.
   */
  def asofJoinSalted(left: DataFrame, right: DataFrame, key: String,
                     leftTime: Column, rightTime: Column,
                     rightCols: Seq[String], rightOrd: Column)
                    (bucketOf: Column => Column): DataFrame = {
    val (tagged, leftCols) =
      unionTagged(left, right, key, leftTime, rightTime, rightCols, rightOrd)
    val unioned = tagged.withColumn("__b", bucketOf(col("__t")))
    val rstruct = when(col("__side") === 0, struct(rightCols.map(col): _*))

    // level 1: resolve within each (key, bucket)
    val wIn = Window.partitionBy(key, "__b")
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__rin", last(rstruct, ignoreNulls = true).over(wIn))

    // level 2: latest right struct per (key, bucket), prefix-carried to
    // later buckets. ONE aggregation over all rows serves two purposes:
    // left rows carry a null ordering key so max_by skips them, but their
    // (key, bucket) groups still materialize — the group set IS the
    // distinct bucket set (left-only buckets get a null __last), so no
    // separate distinct scan + join is needed. Partial aggregation means
    // only ~1 row per (key, bucket, task) reaches the shuffle.
    val lastPerBucket = unioned
      .groupBy(key, "__b")
      .agg(max_by(rstruct,
        when(col("__side") === 0, struct(col("__t"), col("__ord")))).as("__last"))
    val wB = Window.partitionBy(key).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe key match: a null key is one (windowable) group everywhere
    // else in this operator — the carry-in join must agree, or null-key
    // rows routed here by [[asofJoinAdaptive]] would lose cross-bucket
    // carry-in that the plain variant's single window provides.
    val carryIn = lastPerBucket
      .withColumn("__cin", last(col("__last"), ignoreNulls = true).over(wB))
      .select(col(key).as("__ck"), col("__b").as("__cb"), col("__cin"))

    carried.filter(col("__side") === 1)
      .join(carryIn,
        col(key) <=> col("__ck") && col("__b") === col("__cb"), "left")
      .withColumn("__r", coalesce(col("__rin"), col("__cin")))
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /**
   * Adaptive as-of join, result-identical to [[asofJoin]] /
   * [[asofJoinSalted]]: routes each key down the cheaper plan its actual
   * volume needs. The salted variant is hot-key-safe but costs ~2× the
   * plain one locally (the bucket-level carry-in machinery); paying that
   * on EVERY key buys safety only for keys whose history exceeds one
   * task. So: one metadata-sized per-key count over both sides' key
   * columns (narrow scan, partial-aggregable) finds the keys above
   * `hotThreshold`; that set is bounded by totalRows / hotThreshold —
   * broadcastable by construction — and splits both inputs with
   * broadcast semi/anti joins. Cold keys (in a healthy dataset: all of
   * them) run the plain single-window plan; hot keys run the salted
   * two-level plan. With NO hot keys the routing is skipped entirely
   * (runtime short-circuit on the materialized, metadata-sized hot set)
   * and the plain plan runs over the raw inputs.
   *
   * The hot-key set is persisted (it feeds four semi/anti joins) via
   * [[Caching.register]]: wrap build-then-materialize in
   * `Caching.scoped { … }` to release it when the pass completes, or
   * release session-wide with `spark.catalog.clearCache()`.
   *
   * Null keys: rows with a null `key` never equi-join (SQL semantics), so
   * the count/semi/anti routing sends them down the COLD branch regardless
   * of volume (`left_anti` keeps them, `left_semi` drops them) — where the
   * plain window puts all of them in ONE task (`partitionBy(key)` groups
   * nulls together). A null-heavy input would hot-spot that task, so both
   * sides' null-key rows are counted like any other key (null-safe count
   * key) and, when they exceed `hotThreshold`, routed to the salted
   * branch explicitly — the salted window on (key, bucket) spreads them
   * across time buckets.
   *
   * @param hotThreshold combined (left + right) row count above which a
   *        key's window no longer fits one task comfortably. The default
   *        (1M rows) is conservative for executor-sized partitions.
   */
  def asofJoinAdaptive(left: DataFrame, right: DataFrame, key: String,
                       leftTime: Column, rightTime: Column,
                       rightCols: Seq[String], rightOrd: Column,
                       hotThreshold: Long = 1000000L)
                      (bucketOf: Column => Column): DataFrame = {
    // null-SAFE routing throughout (`<=>`): a plain equi semi/anti would
    // send null-key rows to the cold branch no matter how many there are
    // (null never equi-matches), silently bypassing the hot-key
    // protection for a null-heavy input. groupBy already treats null as
    // one group, so the count side needs no change.
    val hot = Caching.register(
      left.select(col(key)).unionByName(right.select(col(key)))
        .groupBy(key).agg(count(lit(1)).as("__kc"))
        .filter(col("__kc") > hotThreshold)
        .select(col(key).as("__hk")))
    // the semi/anti joins move `key` to the front — restore the caller's
    // column order so all three variants are drop-in interchangeable
    val outCols = left.columns.toSeq ++ rightCols
    // AQE-style runtime short-circuit: the hot set is materialized anyway
    // (it feeds the broadcasts) and is metadata-sized by construction, so
    // asking "is it empty?" costs nothing beyond the count that already
    // ran — and in a healthy dataset it IS empty, where the routed plan
    // would still pay 4 semi/anti joins plus the whole (empty) salted
    // branch's stages: measured ~2× the plain plan at sf0.1. Same rows
    // either way (AsofJoinSpec/FuzzSpec pin all three variants equal);
    // the split plan runs only when some key actually needs it.
    if (hot.isEmpty)
      return asofJoin(left, right, key, leftTime, rightTime,
        rightCols, rightOrd).select(outCols.map(col): _*)
    def anti(df: DataFrame) =
      df.join(broadcast(hot), col(key) <=> col("__hk"), "left_anti")
    def semi(df: DataFrame) =
      df.join(broadcast(hot), col(key) <=> col("__hk"), "left_semi")
    val cold = asofJoin(anti(left), anti(right),
      key, leftTime, rightTime, rightCols, rightOrd)
    val salted = asofJoinSalted(semi(left), semi(right),
      key, leftTime, rightTime, rightCols, rightOrd)(bucketOf)
    cold.unionByName(salted).select(outCols.map(col): _*)
  }

  /** Shared plumbing: tag each side, pad missing columns with typed
    * nulls, union — columns (leftCols ++ rightCols ++ __t/__side/__ord). */
  private def unionTagged(left: DataFrame, right: DataFrame, key: String,
                          leftTime: Column, rightTime: Column,
                          rightCols: Seq[String], rightOrd: Column)
      : (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    val overlap = leftCols.toSet.intersect(rightCols.toSet)
    require(overlap.isEmpty,
      s"rename right columns colliding with the left side first: $overlap")
    require(rightCols.forall(right.columns.contains),
      s"rightCols must exist on the right side: $rightCols")
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
      .withColumn("__ord", lit(Long.MaxValue))
    val lPadded = rightCols.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))

    val r0 = right
      .withColumn("__t", rightTime)
      .withColumn("__side", lit(0))
      .withColumn("__ord", rightOrd.cast("long"))
      .withColumnRenamed(key, "__k")
    val rPadded = leftCols.filter(_ != key).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .withColumnRenamed("__k", key)

    val cols = leftCols ++ rightCols ++ Seq("__t", "__side", "__ord")
    (lPadded.select(cols.map(col): _*)
      .unionByName(rPadded.select(cols.map(col): _*)), leftCols)
  }
}
