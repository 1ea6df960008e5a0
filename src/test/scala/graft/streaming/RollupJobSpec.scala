package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.jobs.StreamingRollupJob

/** The continuously-maintained daily rollup (StreamingJobs
  * .streamingDailyRollup): exactly-once raw ingest, idempotent
  * affected-day recompute, and convergence across both crash windows
  * (before the raw marker; between the raw marker and the rollup
  * refresh). */
class RollupJobSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("event_id", "user_id", "ts", "event_type", "value")
  private def ev(id: Long, user: Long, day: Long, typ: String, v: Double) =
    (id, user, day * 86400000000000L + id, typ, v)

  /** (day, type, n_events, n_users, value_cents) of the served rollup. */
  private def rollup(store: String): Set[(Long, String, Long, Long, Long)] =
    spark.read.parquet(s"$store/rollup")
      .select(col("event_day").cast("long"), col("event_type"),
        col("n_events"), col("n_users"), col("value_cents"))
      .as[(Long, String, Long, Long, Long)].collect().toSet

  private def expected(rows: Seq[(Long, Long, Long, String, Double)])
      : Set[(Long, String, Long, Long, Long)] =
    rows.toDF(cols: _*)
      .withColumn("event_day", expr("ts div 86400000000000"))
      .groupBy("event_day", "event_type")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
      .as[(Long, String, Long, Long, Long)].collect().toSet

  private def drop(root: String, name: String,
                   rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    rows.toDF(cols: _*).coalesce(1).write.parquet(s"$root/stage_$name")
    scala.util.Using.resource(java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/stage_$name")))(
      _.filter(_.toString.endsWith(".parquet"))
        .forEach(f => java.nio.file.Files.move(f,
          java.nio.file.Paths.get(s"$root/watch/$name.parquet"))))
  }

  private def runStream(root: String): Unit = {
    val q = StreamingRollupJob.start(spark, s"$root/watch", s"$root/store",
      s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
  }

  test("rollup partitions track the affected days across micro-batches; " +
    "untouched days keep their files") {
    val root = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val b1 = Seq(ev(1, 100, 1, "view", 1.25), ev(2, 101, 1, "click", 2.5),
      ev(3, 100, 2, "view", 0.75))
    val b2 = Seq(ev(4, 102, 2, "view", 4.0), ev(5, 100, 3, "click", 1.0))
    try {
      drop(root, "b1", b1)
      runStream(root)
      assert(rollup(s"$root/store") == expected(b1))
      val day1Before = graft.io.Fs.walkNames(java.nio.file.Paths.get(
        s"$root/store/rollup/event_day=1")).toSet

      drop(root, "b2", b2)
      runStream(root)
      assert(rollup(s"$root/store") == expected(b1 ++ b2))
      // batch 2 touched days 2 and 3 only — day 1's files are untouched
      val day1After = graft.io.Fs.walkNames(java.nio.file.Paths.get(
        s"$root/store/rollup/event_day=1")).toSet
      assert(day1After == day1Before, "dynamic overwrite rewrote an " +
        "unaffected day")
      // raw has every row exactly once
      assert(spark.read.parquet(graft.io.Tables.resolveComponent(
        spark, s"$root/store/raw")).count() == (b1 ++ b2).length)

      // range-distinct from the PERSISTED per-day sketches: any day
      // window answered by unioning rollup sketches, no raw rescan —
      // exact here (HLL sparse mode is exact at these cardinalities)
      val exactAll = (b1 ++ b2).map(_._2).distinct.size.toLong
      assert(StreamingJobs.rangeDistinctUsers(
        spark, s"$root/store", 1L, 3L) == exactAll)
      val exactD1 = (b1 ++ b2).filter(r => r._3 / 86400000000000L == 1L)
        .map(_._2).distinct.size.toLong
      assert(StreamingJobs.rangeDistinctUsers(
        spark, s"$root/store", 1L, 1L) == exactD1)

      // a day partition written by a PRE-SKETCH rollup (no users_sketch
      // column) must fail the range query loudly, not undercount
      spark.range(1).selectExpr("4L AS event_day", "'view' AS event_type",
          "1L AS n_events", "1L AS n_users", "100L AS value_cents")
        .write.mode("append").partitionBy("event_day")
        .parquet(s"$root/store/rollup")
      val e = intercept[IllegalStateException] {
        StreamingJobs.rangeDistinctUsers(spark, s"$root/store", 1L, 4L)
      }
      assert(e.getMessage.contains("predate"))
    } finally graft.io.Fs.deleteRecursively(root)
  }

  test("both crash windows converge on replay: after the raw marker but " +
    "before the rollup refresh, and a fully-completed-but-uncommitted " +
    "checkpoint epoch") {
    val root = java.nio.file.Files.createTempDirectory("graft_rollupk").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/watch"))
    val store = s"$root/store"
    val b1 = Seq(ev(1, 100, 1, "view", 1.25))
    val b2 = Seq(ev(2, 101, 1, "click", 2.5), ev(3, 100, 2, "view", 0.75))
    try {
      drop(root, "b1", b1)
      runStream(root)
      assert(rollup(store) == expected(b1))

      // CRASH WINDOW 1: epoch 1's raw append marker-committed, engine
      // died BEFORE the rollup refresh (emulate: perform only the raw
      // append the job would, same queryId + epoch id the restart
      // assigns)
      val withDay = b2.toDF(cols: _*)
        .withColumn("event_day", expr("ts div 86400000000000"))
      assert(graft.io.EpochCommit.append(spark, store, Seq("raw"), 1L,
        "rollup") { staging =>
        withDay.repartitionByRange(2, col("event_day"))
          .sortWithinPartitions("event_day")
          .write.mode("overwrite").parquet(s"$staging/raw")
      })
      // rollup is now STALE (raw has b2, rollup doesn't)
      assert(rollup(store) == expected(b1))

      // restart: the replayed epoch skips the raw append (marker) but
      // MUST still refresh the affected days
      drop(root, "b2", b2)
      runStream(root)
      assert(rollup(store) == expected(b1 ++ b2),
        "replay did not refresh the stale rollup")
      assert(spark.read.parquet(graft.io.Tables.resolveComponent(
        spark, s"$store/raw")).count() == 3, "replay double-appended raw")
    } finally graft.io.Fs.deleteRecursively(root)
  }
}
