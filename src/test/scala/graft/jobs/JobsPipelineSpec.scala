package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Csv, Transforms}

/** Golden end-to-end of the reference's flagship dataflow
  * (flinkStreamProcessing: Kafka → parse → symbol filter → enrich → CSV
  * out), run over fixtures in batch AND as a stream — SURVEY §5 item 2. */
class JobsPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    "NYSE,ABB,2010-01-04,19.05,19.19,18.90,19.12,1720000,17.84",
    "NYSE,GE,2011-03-15,19.45,19.70,19.30,19.61,66834000,16.98", // filtered out
    "NYSE,IBM,2010-12-31,146.73,147.07,145.96,146.76,2969800,122.30")

  private val golden = Seq(
    "42,nyse_in,NYSE,ABB,2010-01-04,19.05,19.19,18.9,19.12,1720000,17.84,0.0700016",
    "42,nyse_in,NYSE,IBM,2010-12-31,146.73,147.07,145.96,146.76,2969800,122.3,0.02999878")

  private def pipeline(src: DataFrame): DataFrame =
    Transforms.enrichCsvLine(
      Transforms.symbolSetFilter(
        Csv.parse(src, Csv.dailyPriceSchema), Seq("ABB", "IBM", "CAT")),
      "nyse_in", clockEpochSec = Some(42L))

  test("batch run matches the golden output") {
    assert(pipeline(lines.toDF("value")).as[String].collect().toSeq == golden)
  }

  test("identical pipeline streams (T5), one micro-batch per add") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val q = pipeline(in.toDF()).writeStream
      .format("memory").queryName("flagship_stream").outputMode("append").start()
    try {
      in.addData(lines.take(2): _*)
      q.processAllAvailable()
      in.addData(lines.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("flagship_stream").as[String].collect().toSet
      assert(got == golden.toSet)
    } finally q.stop()
  }
}
