package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage timing of the m9 view-maintenance round trip at
  * sf0.1 (local[32], shuffle=32). Measured 2026-08-14 (loadavg ~2):
  * create 2.9-3.6 / bootstrap 1.5-1.8 / merge 1.2-2.2 / sync 2.6-4.2 /
  * restore 1.3-1.8 / sync2 2.7-3.5 / read 0.1. Inside a sync, the diff
  * materialization is 0.7-1.3 s and the tiny VIEW commit 1.5-2.3 s —
  * the latter almost entirely task-launch overhead: ≤7-row stages run
  * 32 shuffle tasks each at the session default. Conclusion (applied in
  * the m9 query): a view-maintenance job must size its shuffle width to
  * the change batch; at width 4 the commit overhead roughly halves.
  * Data volume is NOT the cost at this scale — machinery jobs are. */
object ProbeM9 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val root = java.nio.file.Files.createTempDirectory("m9probe").toString
    val rowCents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val b = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"),
        rowCents.as("price_cents"))
    val mk = b.agg(max("o_orderkey")).first().getLong(0)
    time("create 16f")(graft.io.ManifestTable.create(b, s"$root/t",
      "o_orderkey", 16))
    time("bootstrap view")(graft.io.AggView.bootstrap(spark, s"$root/t",
      s"$root/view", "o_orderpriority", "price_cents"))
    b.filter(col("o_orderkey") * 100 <= lit(mk))
      .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"),
        (col("price_cents") + 10000000L).as("price_cents"))
      .unionByName(b.filter(col("o_orderkey") % 101 === 5)
        .select((col("o_orderkey") + lit(mk)).as("o_orderkey"),
          lit("INSERTED").as("o_orderpriority"), col("price_cents")))
      .write.parquet(s"$root/upd")
    b.filter(col("o_orderkey") * 100 <= lit(mk))
      .write.parquet(s"$root/restore_up")
    b.filter(col("o_orderkey") % 101 === 5)
      .select((col("o_orderkey") + lit(mk)).as("o_orderkey"))
      .write.parquet(s"$root/restore_del")
    (1 to 2).foreach { round =>
      println(s"round $round:")
      time("merge")(graft.io.ManifestTable.merge(spark, s"$root/t",
        spark.read.parquet(s"$root/upd")))
      time("sync 1")(graft.io.AggView.sync(spark, s"$root/t",
        s"$root/view", "o_orderpriority", "price_cents"))
      time("restore")(graft.io.ManifestTable.upsertAndDelete(spark,
        s"$root/t", spark.read.parquet(s"$root/restore_up"),
        spark.read.parquet(s"$root/restore_del")))
      time("sync 2")(graft.io.AggView.sync(spark, s"$root/t",
        s"$root/view", "o_orderpriority", "price_cents"))
      time("read view")(graft.io.ManifestTable.read(spark, s"$root/view")
        .write.format("noop").mode("overwrite").save())
    }
    graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
