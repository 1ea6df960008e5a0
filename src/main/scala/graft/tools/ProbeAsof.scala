package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

/** Dev probe: plain vs salted as-of join at several bucket widths —
  * equality + timing (isolated from bench-context noise). */
object ProbeAsof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val ev = graft.Queries.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_custkey").as("user_id"),
        unix_timestamp(col("o_orderdate")).as("order_sec"))
      .agg(max("o_orderkey").as("o_orderkey"))

    def plain = AsofJoin.asofJoin(ev, ord, "user_id", col("ts"),
      col("order_sec") * lit(1000000000L), Seq("o_orderkey"), col("o_orderkey"))
    def salted(days: Long) = AsofJoin.asofJoinSalted(ev, ord, "user_id",
      col("ts"), col("order_sec") * lit(1000000000L), Seq("o_orderkey"),
      col("o_orderkey"))(t => floor(t / (days * 86400000000000L)).cast("long"))

    def run(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: median ${times.sorted.apply(1)}%.3f s  (${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    def adaptive(thr: Long) = AsofJoin.asofJoinAdaptive(ev, ord, "user_id",
      col("ts"), col("order_sec") * lit(1000000000L), Seq("o_orderkey"),
      col("o_orderkey"), hotThreshold = thr)(
      t => floor(t / (7L * 86400000000000L)).cast("long"))

    run("plain      ")(plain)
    for (d <- Seq(1L, 7L, 30L, 90L, 365L)) run(f"salted $d%4dd")(salted(d))
    // adaptive: all-cold (1M), and forced all-hot (0) for the upper bound
    run("adaptive 1M")(adaptive(1000000L))
    run("adaptive 0 ")(adaptive(0L))
    // sanity: result identity
    val a = plain.collect().map(_.toSeq).toSet
    val b = salted(30L).collect().map(_.toSeq).toSet
    val c = adaptive(1000000L).collect().map(_.toSeq).toSet
    val d = adaptive(10000L).collect().map(_.toSeq).toSet // mixed split
    println(s"equal(plain, salted30): ${a == b}")
    println(s"equal(plain, adaptive1M): ${a == c}")
    println(s"equal(plain, adaptiveMixed): ${a == d}")
    spark.stop()
  }
}
