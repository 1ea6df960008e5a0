package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Steady-state deletion-vector cost, isolated from the create: the
 * bench's `m16_dv_merge` is CREATE-INCLUDED by design, so this probe
 * separates the table build (once) from the repeated mutate cycle —
 * deleteKeysDV + upsertDV + rollup read — the number a CDC cadence
 * actually pays per batch. Also times the copy-on-write twin of the
 * same cycle for the write-amplification comparison.
 *
 * Usage: runMain graft.tools.ProbeDv [sfDir] [reps]
 */
object ProbeDv {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rowCents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val base = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"),
        rowCents.as("price_cents"))
    val mk = base.agg(max("o_orderkey")).first().getLong(0)
    val delKeys = base.filter(col("o_orderkey") % 13 === 4)
      .select("o_orderkey")
    val updates = base.filter(col("o_orderkey") % 11 === 5)
      .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"),
        (col("price_cents") + 7L).as("price_cents"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def rollup(path: String): Long =
      graft.io.ManifestTable.read(spark, path)
        .groupBy("o_orderpriority").agg(sum("price_cents")).count()

    val root = java.nio.file.Files.createTempDirectory("graft_probedv")
    val dvPath = s"$root/dv"; val cowPath = s"$root/cow"
    val (_, tCreate) = time {
      graft.io.ManifestTable.create(base, dvPath, "o_orderkey", 8)
      graft.io.ManifestTable.create(base, cowPath, "o_orderkey", 8)
    }
    println(f"create (both tables): $tCreate%.2f s (mk=$mk)")
    (1 to reps).foreach { i =>
      val (st, tDel) = time(
        graft.io.ManifestTable.deleteKeysDV(spark, dvPath, delKeys))
      val (st2, tUp) = time(
        graft.io.ManifestTable.upsertDV(spark, dvPath, updates))
      val (_, tRead) = time(rollup(dvPath))
      println(f"dv cycle $i: delete $tDel%.2f s (dead=${st.deadMarked}), " +
        f"upsert $tUp%.2f s (dead=${st2.deadMarked} files+=${st2.filesWritten}), " +
        f"read $tRead%.2f s")
      val (ms, tDelC) = time(
        graft.io.ManifestTable.deleteKeys(spark, cowPath, delKeys))
      val (ms2, tUpC) = time(
        graft.io.ManifestTable.merge(spark, cowPath, updates))
      val (_, tReadC) = time(rollup(cowPath))
      println(f"cow cycle $i: delete $tDelC%.2f s " +
        f"(rewrote=${ms.filesRewritten}), merge $tUpC%.2f s " +
        f"(rewrote=${ms2.filesRewritten}), read $tReadC%.2f s")
    }
    // the write-amplification case the feature exists for: ONE big file
    // (at 100 TB: a 1 GB file), where copy-on-write rewrites the whole
    // file per batch and the dv path writes a batch-sized sidecar
    val dv1 = s"$root/dv1"; val cow1 = s"$root/cow1"
    // 10x the base into ONE ~1.5M-row file so the rewrite cost is
    // visible over fixed job overheads (the shape a 1 GB file has)
    val big = (0 until 10).map(k => base.select(
        (col("o_orderkey") + lit(k.toLong * (mk + 1))).as("o_orderkey"),
        col("o_orderpriority"), col("price_cents")))
      .reduce(_ unionByName _)
    graft.io.ManifestTable.create(big, dv1, "o_orderkey", 1)
    graft.io.ManifestTable.create(big, cow1, "o_orderkey", 1)
    (1 to reps).foreach { i =>
      // fresh keys per cycle — a repeat of the same batch is a dv no-op
      val smallDel = big.filter(col("o_orderkey") % 9973 === i)
        .select("o_orderkey")
      val (st, tDv) = time(
        graft.io.ManifestTable.deleteKeysDV(spark, dv1, smallDel))
      val (ms, tCow) = time(
        graft.io.ManifestTable.deleteKeys(spark, cow1, smallDel))
      println(f"1-file delete cycle $i (batch=${st.deadMarked}): " +
        f"dv $tDv%.2f s vs cow $tCow%.2f s " +
        f"(cow rewrote ${ms.filesRewritten} file(s) of ${big.count()} rows)")
    }
    graft.io.Fs.deleteRecursively(root)
    spark.stop()
  }
}
