package graft.io

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** K2/K6 file sinks driven end-to-end via MemoryStream. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("K2: rolling file sink writes hour-bucketed csv partitions") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val tmp = Files.createTempDirectory("graft-k2").toString
    val q = Sinks.rollingTextFiles(in.toDF(), s"$tmp/out", s"$tmp/ckpt",
      triggerInterval = "1 second").start()
    try {
      in.addData("NYSE,ABB,19.12", "NYSE,IBM,146.76")
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.csv(s"$tmp/out")
    assert(back.count() == 2)
    // partition column materialized as bucket=yyyy-MM-dd--HH directories
    val buckets = back.select("bucket").distinct().as[String].collect()
    assert(buckets.length == 1 && buckets.head.matches("""\d{4}-\d{2}-\d{2}--\d{2}"""))
  }

  test("K2 bytes-exact: part files roll at the byte cap, per partition") {
    val tmp = Files.createTempDirectory("graft-k2b").toString
    // 40 rows of 10 bytes (9 chars + newline) on 2 partitions, 64-byte cap
    // → each partition rolls after 7 rows: ceil(200/70) ≈ 3 files each
    val df = spark.range(40).select(
      format_string("row%06d", col("id")).as("value")).repartition(2)
    Sinks.writeRollingBytes(s"$tmp/out", maxBytes = 64)(df, epochId = 7L)

    val files = new java.io.File(tmp, "out").listFiles().head.listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length >= 4, files.map(_.getName).mkString(","))
    // every file is bounded by cap + one record, and no file is empty
    assert(files.forall(f => f.length > 0 && f.length <= 64 + 10))
    // all part files carry the epoch id (replay overwrites, not duplicates)
    assert(files.forall(_.getName.startsWith("part-7-")))
    // nothing lost: the concatenation holds all 40 rows exactly once
    val back = spark.read.text(s"$tmp/out").select("value").as[String]
      .collect().toSet
    assert(back == (0L until 40L).map(i => f"row$i%06d").toSet)
    // replaying the same epoch rewrites the same file names → same count
    Sinks.writeRollingBytes(s"$tmp/out", maxBytes = 64)(df, epochId = 7L)
    assert(spark.read.text(s"$tmp/out").count() == 40)
  }

  test("K2 bytes-exact wired as a stream: foreachBatch rolls per micro-batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val tmp = Files.createTempDirectory("graft-k2bs").toString
    val q = in.toDF().writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch(Sinks.writeRollingBytes(s"$tmp/out", maxBytes = 32) _)
      .start()
    try {
      in.addData((1 to 10).map(i => f"line$i%04d"): _*) // 10 × 9 bytes
      q.processAllAvailable()
      in.addData("tail0001")
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.text(s"$tmp/out").select("value").as[String]
      .collect().toSet
    assert(rows == ((1 to 10).map(i => f"line$i%04d").toSet + "tail0001"))
    // multiple part files exist and all carry epoch-scoped names
    val parts = new java.io.File(tmp, "out").listFiles()
      .flatMap(_.listFiles()).filter(_.getName.startsWith("part-"))
    assert(parts.length >= 3)
    assert(parts.forall(_.length <= 32 + 9))
  }

  test("K6: parquet stream sink round-trips typed rows") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val tmp = Files.createTempDirectory("graft-k6").toString
    val q = Sinks.parquetStream(in.toDF().toDF("symbol", "price"),
      s"$tmp/out", s"$tmp/ckpt").start()
    try {
      in.addData(("ABB", 19.12), ("IBM", 146.76))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(s"$tmp/out").as[(String, Double)].collect().toSet
    assert(back == Set(("ABB", 19.12), ("IBM", 146.76)))
  }

  test("K7: single-file text overwrite") {
    val tmp = Files.createTempDirectory("graft-k7").toString
    Sinks.textOverwrite(Seq("line1", "line2").toDF("value"), s"$tmp/out")
    Sinks.textOverwrite(Seq("line3").toDF("value"), s"$tmp/out") // overwrite
    assert(spark.read.text(s"$tmp/out").as[String].collect().toSeq == Seq("line3"))
  }
}
