package graft.tools
import org.apache.spark.sql.functions._
/** m9 composition census: which stage owns the entry's cost — the two
  * SOURCE commits (merge / upsertAndDelete on the 16-file table) or
  * the two view SYNCS (diff + fold + swap)? */
object ProbeM9 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.create("probe-m9", "local[32]", 32)
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // optional arg: aqe=off — isolate AQE's per-query replanning cost
    // on the tiny-commit class
    if (args.contains("aqe=off"))
      s.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 3).foreach { i => println(s"=== pass $i ==="); run(s, dir) }
  }
  def run(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val rowCents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val b = s.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"),
      col("o_orderpriority"), rowCents.as("price_cents"))
    val mk = b.agg(max("o_orderkey")).first().getLong(0)
    val root = java.nio.file.Files.createTempDirectory("m9p").toString
    val src = s"$root/t"; val view = s"$root/view"
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"$label%-18s ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    graft.io.ManifestTable.create(b, src, "o_orderkey", numFiles = 16)
    graft.io.AggView.bootstrap(s, src, view, "o_orderpriority", "price_cents")
    val repriced = b.filter(col("o_orderkey") * 100 <= lit(mk))
    val inserted = b.filter(col("o_orderkey") % 101 === 5)
      .select((col("o_orderkey") + lit(mk)).as("o_orderkey"),
        lit("INSERTED").as("o_orderpriority"), col("price_cents"))
    val upd = repriced
      .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"),
        (col("price_cents") + 10000000L).as("price_cents"))
      .unionByName(inserted)
    upd.write.parquet(s"$root/upd")
    repriced.write.parquet(s"$root/rup")
    inserted.select("o_orderkey").write.parquet(s"$root/rdel")
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "4")
      t("merge")(graft.io.ManifestTable.merge(s, src, s.read.parquet(s"$root/upd")))
      t("sync1")(graft.io.AggView.sync(s, src, view, "o_orderpriority", "price_cents"))
      t("restore")(graft.io.ManifestTable.upsertAndDelete(s, src,
        s.read.parquet(s"$root/rup"), s.read.parquet(s"$root/rdel")))
      t("sync2")(graft.io.AggView.sync(s, src, view, "o_orderpriority", "price_cents"))
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
