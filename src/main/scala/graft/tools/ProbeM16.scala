package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the m16_dv_merge bench entry: where do the
  * ~4 s go — fixture scan, create, deleteKeysDV, upsertDV, or the final
  * rollup read? Drives the production ops verbatim on the bench fixture
  * so a shave can target the dominant phase instead of guessing. */
object ProbeM16 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-phase Spark-job census: count + total job wall-clock, so the
    // phase split shows scheduler/launch overhead vs true work
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { t0 =>
            jobs.incrementAndGet()
            jobNanos.addAndGet(System.nanoTime() - t0)
          }
        }
      })
    val verbose = sys.env.contains("PROBE_M16_JOBS")
    if (verbose)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            t0s.put(j.jobId, System.nanoTime())
            // the final stage's name carries the action's callsite —
            // enough to attribute each job to a ManifestTable line
            descs.put(j.jobId, j.stageInfos.map(_.name).distinct
              .mkString(" | ").take(160))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            Option(t0s.remove(j.jobId)).foreach { t0 =>
              println(f"      job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  ${descs.remove(j.jobId)}")
            }
        })

    def time[T](label: String)(f: => T): T = {
      jobs.set(0); jobNanos.set(0L)
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(50) // let the listener bus drain (probe-only)
      println(f"  $label%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  (${jobs.get()}%2d jobs, ${jobNanos.get() / 1e9}%5.2f s in-job)")
      r
    }

    (1 to reps).foreach { i =>
      println(s"== rep $i ==")
      val rowCents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"),
          rowCents.as("price_cents"))
      val mk = time("fixture max")(
        base.agg(max("o_orderkey")).first().getLong(0))
      val updates = base.filter(col("o_orderkey") * 10 <= lit(mk))
          .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"),
            (col("price_cents") + 10000000L).as("price_cents"))
        .unionByName(base.filter(col("o_orderkey") % 11 === 5)
          .select((col("o_orderkey") + lit(mk)).as("o_orderkey"),
            lit("INSERTED").as("o_orderpriority"), col("price_cents")))
      val root = java.nio.file.Files.createTempDirectory("graft_m16")
      val path = s"$root/t"
      time("create")(
        graft.io.ManifestTable.create(base, path, "o_orderkey", numFiles = 8))
      time("deleteKeysDV")(graft.io.ManifestTable.deleteKeysDV(spark, path,
        base.filter(col("o_orderkey") % 13 === 4).select("o_orderkey")))
      time("upsertDV")(graft.io.ManifestTable.upsertDV(spark, path, updates))
      time("rollup read")(graft.io.ManifestTable.read(spark, path)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"))
        .collect())
      graft.io.Fs.deleteRecursively(root)
    }
    spark.stop()
  }
}
