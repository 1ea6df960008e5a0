package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Anatomy of ONE warm tiny commit (the m9/m30 shared cost class): a
  * job-timeline listener around a small merge + agg-view sync prints
  * every Spark job's wall span and the DRIVER-SIDE GAPS between jobs —
  * the gaps are plan analysis + manifest IO + retention, the part no
  * executor parallelism can hide. Feeds BASELINE.md attribution. */
object ProbeCommitAnatomy {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.create("probe-anatomy", "local[32]", 32)
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val rowCents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val b = s.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"),
      col("o_orderpriority"), rowCents.as("price_cents"))
    val mk = b.agg(max("o_orderkey")).first().getLong(0)
    val root = java.nio.file.Files.createTempDirectory("anat").toString
    val src = s"$root/t"; val view = s"$root/view"
    graft.io.ManifestTable.create(b, src, "o_orderkey", numFiles = 16)
    graft.io.AggView.bootstrap(s, src, view, "o_orderpriority", "price_cents")
    val upd = b.filter(col("o_orderkey") % 101 === 5)
      .select(col("o_orderkey"), lit("MERGED").as("o_orderpriority"),
        (col("price_cents") + 1L).as("price_cents"))
    upd.write.parquet(s"$root/upd")
    val batch = s.read.parquet(s"$root/upd")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long, Long, String)]()
    val lst = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (t0, d) =>
          done.add((j.jobId, t0, j.time, d))
        }
      }
    }
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    // warm one pass first
    graft.io.ManifestTable.merge(s, src, batch)
    graft.io.AggView.sync(s, src, view, "o_orderpriority", "price_cents")
    s.sparkContext.addSparkListener(lst)
    def timeline(label: String)(f: => Unit): Unit = {
      done.clear()
      val t0 = System.currentTimeMillis
      f
      val t1 = System.currentTimeMillis
      Thread.sleep(300) // let the listener bus drain
      println(s"== $label total ${t1 - t0} ms ==")
      var cursor = t0
      val sorted = done.toArray.map(_.asInstanceOf[(Int, Long, Long, String)])
        .sortBy(_._2)
      sorted.foreach { case (id, js, je, d) =>
        val gap = js - cursor
        println(f"  gap ${gap}%5d ms | job $id%3d ${je - js}%5d ms  ${d.take(90)}")
        cursor = math.max(cursor, je)
      }
      println(f"  tail gap ${t1 - cursor}%5d ms")
    }
    timeline("merge")(graft.io.ManifestTable.merge(s, src, batch))
    timeline("sync")(graft.io.AggView.sync(s, src, view,
      "o_orderpriority", "price_cents"))
    // the dv-commit ops the SQL DML tier routes to (m30/m33's cost)
    timeline("deleteWhere")(graft.io.ManifestTable.deleteWhere(s, src,
      col("o_orderkey") % 1009 === 7))
    timeline("updateWhere")(graft.io.ManifestTable.updateWhere(s, src,
      col("o_orderkey") % 1013 === 7,
      Map("price_cents" -> (col("price_cents") + 1))))
    import graft.io.ManifestTable.{WhenMatched, UpdateSet}
    timeline("mergeInto")(graft.io.ManifestTable.mergeInto(s, src,
      batch.limit(500), Seq(WhenMatched(None,
        UpdateSet(Map("price_cents" -> col("s.price_cents"))))),
      insertUnmatched = false, assertSourceUnique = true))
    s.conf.set("spark.sql.shuffle.partitions", prev)
    graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
