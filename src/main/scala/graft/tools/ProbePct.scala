package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Percentiles

/** Dev probe: plain vs bucketed exact percentiles — equality + timing. */
object ProbePct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def run(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val plain = Percentiles.exactPercentiles(
      li, Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75))
    val bucketed = Percentiles.exactPercentilesBucketed(
      li, Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.5, 0.75))(
      v => floor(v / 2000).cast("long"))
    val a = plain.collect().map(_.toSeq).toSet
    val b = bucketed.collect().map(_.toSeq).toSet
    println(s"equal: ${a == b}")
    if (a != b) { println(a.mkString("\n")); println("---"); println(b.mkString("\n")) }
    run("plain   ")(plain)
    run("bucketed")(bucketed)
    run("plain   ")(plain)
    run("bucketed")(bucketed)
    spark.stop()
  }
}
