package graft.tools
import org.apache.spark.sql.functions._
object ProbeM30 {
  def main(args: Array[String]): Unit = {
    (1 to 3).foreach(i => { println(s"=== pass $i ==="); run() })
  }
  def run(): Unit = {
    val s = graft.GraftSession.create("probe-m30", "local[32]", 32)
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val rowCents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val base = s.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"),
      col("o_orderpriority"), rowCents.as("price_cents"))
    val root = java.nio.file.Files.createTempDirectory("m30p").toString
    val path = s"$root/t"
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"$label%-22s ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    t("create")(graft.io.ManifestTable.create(base, path, "o_orderkey",
      numFiles = 8, statsCols = Seq("o_orderpriority")))
    t("register")(s.sql(s"CREATE TABLE m30p USING graft OPTIONS (path '$path', key 'o_orderkey')"))
    t("delete")(s.sql("DELETE FROM m30p WHERE o_orderkey % 11 = 5"))
    val maxk = base.agg(max("o_orderkey")).first().getLong(0)
    val ulo = maxk / 4; val uhi = ulo + maxk / 10
    t("update")(s.sql(s"UPDATE m30p SET price_cents = price_cents + 7 WHERE o_orderkey BETWEEN $ulo AND $uhi"))
    base.filter(col("o_orderkey") % 17 === 3)
      .select((col("o_orderkey") + maxk).as("o_orderkey"),
        lit("9-INS").as("o_orderpriority"), col("price_cents"))
      .createOrReplaceTempView("m30p_ins")
    t("insert")(s.sql("INSERT INTO m30p SELECT * FROM m30p_ins"))
    val mlo = maxk / 2; val mhi = mlo + maxk / 10
    base.filter(col("o_orderkey").between(mlo, mhi))
      .select(col("o_orderkey"), lit("8-MRG").as("o_orderpriority"),
        (col("price_cents") * 3).as("price_cents"))
      .unionByName(base.filter(col("o_orderkey") % 17 === 9)
        .select((col("o_orderkey") + maxk * 2).as("o_orderkey"),
          lit("8-MRG").as("o_orderpriority"),
          (col("price_cents") * 3).as("price_cents")))
      .createOrReplaceTempView("m30p_src")
    t("merge")(s.sql(
      """MERGE INTO m30p t USING m30p_src s ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND t.price_cents % 2 = 0 THEN
        |  UPDATE SET price_cents = s.price_cents
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    // programmatic twins on a sibling table (same content/fixture)
    val path2 = s"$root/t2"
    graft.io.ManifestTable.create(base, path2, "o_orderkey",
      numFiles = 8, statsCols = Seq("o_orderpriority"))
    t("prog deleteWhere")(graft.io.ManifestTable.deleteWhere(s, path2,
      col("o_orderkey") % 11 === 5))
    t("prog updateWhere")(graft.io.ManifestTable.updateWhere(s, path2,
      col("o_orderkey").between(ulo, uhi),
      Map("price_cents" -> (col("price_cents") + 7))))
    t("final read")(graft.io.ManifestTable.read(s, path)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("total_cents"))
      .write.format("noop").mode("overwrite").save())
    s.sql("DROP TABLE IF EXISTS m30p")
    graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
