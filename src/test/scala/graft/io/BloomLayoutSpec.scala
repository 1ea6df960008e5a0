package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The parquet-bloom point-lookup layout behind `e8_event_lookup`
  * (io.Tables.writeHashClusteredBloom): footers must actually carry the
  * bloom, the bloom must actually skip row groups for a pushed equality
  * on a mid-range id (which per-row-group min/max stats can NEVER skip —
  * hash clustering puts the id inside every file's range), and the
  * layout must never change a result. */
class BloomLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val files = 8

  private lazy val root: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    Tables.writeHashClusteredBloom(
      graft.Queries.events(spark, dir), s"$p/events", files,
      bloomCol = "event_id", expectedNdv = 2000, "ts")
    p
  }
  private def store: DataFrame = spark.read.parquet(s"$root/events")

  /** Smallest id above the id-range midpoint — inside every file's
    * [min,max] by construction (same probe as the declared query). */
  private lazy val target: Long = {
    val r = store.agg(min("event_id"), max("event_id")).first()
    val mid = (r.getLong(0) + r.getLong(1)) / 2
    store.filter(col("event_id") > mid).agg(min("event_id")).first().getLong(0)
  }

  /** Rows the parquet scan OUTPUT (i.e. rows in row groups that survived
    * footer-level pruning) for a collect()ed single-table query. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case f: FileSourceScanExec => f }
    assert(scan.nonEmpty, plan.toString)
    scan.head.metrics("numOutputRows").value
  }

  test("every data file's footer carries a bloom filter for event_id") {
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = new java.io.File(s"$root/events").listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length == files, parts.map(_.getName).mkString(","))
    parts.foreach { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try r.getRowGroups.asScala.foreach { block =>
        val cc = block.getColumns.asScala
          .find(_.getPath.toDotString == "event_id").get
        assert(r.getBloomFilterDataReader(block).readBloomFilter(cc) != null,
          s"no bloom for event_id in ${f.getName}")
      } finally r.close()
    }
  }

  test("a pushed mid-range equality skips most row groups via the bloom " +
    "(and reads everything once bloom filtering is disabled)") {
    val total = store.count()
    val withBloom = scanRows(store.filter(col("event_id") === target))
    val noBloom = scanRows(
      spark.read.option("parquet.filter.bloom.enabled", "false")
        .parquet(s"$root/events").filter(col("event_id") === target))
    // mid-range id: stats/page-index pruning can skip at most a sliver,
    // so the bloom-off scan reads essentially the whole store...
    assert(noBloom * 4 >= total * 3, s"noBloom=$noBloom total=$total")
    // ...and the bloom-on scan reads about one cluster of `files`
    assert(withBloom * 4 <= total, s"withBloom=$withBloom total=$total")
    assert(withBloom < noBloom)
  }

  test("an absent id returns empty through the bloom layout, same as " +
    "the flat table (no false-positive rows — blooms only SKIP)") {
    val ghost = store.agg(max("event_id")).first().getLong(0) + 1
    assert(store.filter(col("event_id") === ghost).isEmpty)
    assert(graft.Queries.events(spark, dir)
      .filter(col("event_id") === ghost).isEmpty)
  }

  test("the layout never changes the lookup result (≡ flat table)") {
    val fromStore = store.filter(col("event_id") === target)
      .select("event_id", "user_id", "ts", "event_type", "value")
    val fromFlat = graft.Queries.events(spark, dir)
      .filter(col("event_id") === target)
      .select("event_id", "user_id", "ts", "event_type", "value")
    assert(fromStore.exceptAll(fromFlat).isEmpty &&
      fromFlat.exceptAll(fromStore).isEmpty)
    assert(fromFlat.count() > 0)
  }
}
