package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.io.{Sinks, Sources}
import graft.io.Sources.AppConfig
import graft.model.{Book, SensorReading}
import graft.ops.{Csv, Transforms}
import graft.streaming.StreamingJobs

/**
 * One runnable object per reference application (13 apps under
 * `/root/reference/src/main/scala/com/bigdatalabs/flinkapps/source/`),
 * each = source + pure transforms + sink, wired from the shared layers.
 * Parameters come from `--key value` args / a properties file (S6), with
 * the reference's `flinkApps.properties` key names.
 *
 * These need live Kafka / Postgres endpoints (and the Kafka connector
 * jar) at runtime; the transform logic they wire is covered by batch +
 * MemoryStream tests instead (SURVEY §5).
 */
object Jobs {

  def session(appName: String): SparkSession =
    SparkSession.builder().appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

  /** Shared NYSE pipeline: CSV line stream → typed prices (P1). */
  def parsePrices(lines: DataFrame): DataFrame = Csv.parse(lines, Csv.dailyPriceSchema)

  /** Shared sensor pipeline (P1 sensor variant, trims whitespace). */
  def parseSensors(lines: DataFrame): DataFrame = Csv.parse(lines, Csv.sensorSchema)
}

/** flinkStarter.scala: socket word count, 5 s cadence → console. */
object WordCountJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("wordCount")
    val counts = StreamingJobs.wordCount(Sources.socketLines(spark,
      c.getOrElse("host", "localhost"), c.getOrElse("port", "9999").toInt))
    Sinks.consoleStream(counts, "update")
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .start().awaitTermination()
  }
}

/** flinkStreamProcessing.scala: Kafka → parse → three filtered/enriched
  * branches → Kafka (idempotent-keyed at-least-once; §7.4 item 1). */
object StreamFilterToKafkaJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromFileAndArgs(args.headOption.getOrElse("flinkApps.properties"), args)
    val spark = Jobs.session("streamFilterToKafka")
    val prices = Jobs.parsePrices(Sources.kafkaStream(spark,
      c.get("BOOTSTRAP_SERVERS"), c.get("INCOMING_TOPIC"), c.get("GROUP_ID")))
    val branch = Transforms.enrichCsvLine(
      Transforms.symbolSetFilter(prices, Seq("ABB", "IBM", "CAT")),
      c.get("INCOMING_TOPIC"))
    Sinks.kafkaStream(branch, c.get("BOOTSTRAP_SERVERS"), c.get("OUTGOING_TOPIC"),
      c.getOrElse("CHECKPOINT_DIR", "/tmp/graft-ckpt/stream-filter"))
      .start().awaitTermination()
  }
}

/** flinkStreamingInput.scala: Kafka → parse → threshold filter → console. */
object StreamingInputJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("streamingInput")
    val prices = Jobs.parsePrices(Sources.kafkaStream(spark,
      c.get("BOOTSTRAP_SERVERS"), c.get("INCOMING_TOPIC"), c.get("GROUP_ID")))
    val filtered = Transforms.thresholdFilter(prices, c.get("symb"),
      c.get("high").toDouble, c.get("low").toDouble)
    Sinks.consoleStream(filtered).start().awaitTermination()
  }
}

/** flinkContinuousProcessingRollover.scala: Kafka → compound filter →
  * enrich → rolling bucketed files. Mirrors the full reference policy:
  * hourly buckets, 15 min rollover interval (the trigger), and the 10 MB
  * part cap bytes-exact via [[Sinks.writeRollingBytes]] (per-partition
  * roll = Flink's per-subtask roll). */
object RollingFileSinkJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("rollingFileSink")
    val prices = Jobs.parsePrices(Sources.kafkaStream(spark,
      c.get("BOOTSTRAP_SERVERS"), c.get("INCOMING_TOPIC"), c.get("GROUP_ID")))
    val out = Transforms.enrichCsvLine(
      Transforms.compoundFilter(prices, Seq("ABB", "IBM", "CAT"),
        c.getOrElse("high", "50.0").toDouble, c.getOrElse("low", "10.0").toDouble,
        2010, 2011),
      c.get("INCOMING_TOPIC"))
    out.writeStream
      .option("checkpointLocation",
        c.getOrElse("CHECKPOINT_DIR", "/tmp/graft-ckpt/rolling"))
      .foreachBatch(Sinks.writeRollingBytes(c.get("OUT_PATH"),
        maxBytes = c.getOrElse("MAX_PART_BYTES", "10485760").toLong) _)
      .trigger(Trigger.ProcessingTime(
        c.getOrElse("ROLLOVER_INTERVAL", "15 minutes")))
      .start().awaitTermination()
  }
}

/** flinkStreamingHDFSSink.scala (stub in the reference, completed here):
  * Kafka → filter → columnar files on any hadoop-compatible URI. */
object StreamToParquetJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("streamToParquet")
    val prices = Jobs.parsePrices(Sources.kafkaStream(spark,
      c.get("BOOTSTRAP_SERVERS"), c.get("INCOMING_TOPIC"), c.get("GROUP_ID")))
    Sinks.parquetStream(
      Transforms.symbolSetFilter(prices, Seq("ABB", "IBM", "CAT")),
      c.get("OUT_PATH"), c.getOrElse("CHECKPOINT_DIR", "/tmp/graft-ckpt/parquet"))
      .start().awaitTermination()
  }
}

/** flinkStreamTable.scala: in-memory rows → SQL grouped sum (A2), BATCH
  * runtime mode in the reference → plain batch here. */
object StreamTableAggJob {
  def main(args: Array[String]): Unit = {
    val spark = Jobs.session("streamTableAgg")
    import spark.implicits._
    Seq(("Alice", 12), ("Bob", 10), ("Alice", 100))
      .toDF("name", "score").createOrReplaceTempView("InputTable")
    spark.sql("SELECT name, SUM(score) AS score_sum FROM InputTable GROUP BY name")
      .show()
  }
}

/** flinkTableManipulation.scala: Kafka → parse → temp view → A3 SQL
  * (grouped min/max by symbol+year) → changelog-style console updates. */
object TableMinMaxJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("tableMinMax")
    val lines = Sources.kafkaStream(spark, c.get("BOOTSTRAP_SERVERS"),
      c.get("INCOMING_TOPIC"), c.get("GROUP_ID"))
    Sinks.consoleStream(StreamingJobs.minMaxBySymbolYear(lines).toDF(), "update")
      .start().awaitTermination()
  }
}

/** flinkStreamingJDBCSink.scala: Kafka sensor stream → K3 upsert protocol
  * via ForeachWriter (open/process/close ≅ RichSinkFunction lifecycle). */
object JdbcUpsertStreamJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromFileAndArgs(args.head, args.tail)
    val spark = Jobs.session("jdbcUpsertStream")
    import spark.implicits._
    val readings = Jobs.parseSensors(Sources.kafkaStream(spark,
      c.get("BOOTSTRAP_SERVERS"), c.get("INCOMING_TOPIC"), c.get("GROUP_ID")))
      .as[SensorReading]
    val url = c.get("JDBC_URL")
    val (user, pwd) = (c.get("JDBC_USER"), c.get("JDBC_PASSWORD"))
    val upsert = new Sinks.JdbcUpsert(
      () => java.sql.DriverManager.getConnection(url, user, pwd),
      c.getOrElse("TABLE", "streamingdb.t_flnk_temperature"))
    readings.writeStream.foreach(upsert.foreachWriter)
      .option("checkpointLocation", c.getOrElse("CHECKPOINT_DIR", "/tmp/graft-ckpt/upsert"))
      .start().awaitTermination()
  }
}

/** flinkStreamingJDBCSink02.scala: declarative batched JDBC appends
  * (1000-row batches) per micro-batch. */
object JdbcAppendStreamJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("jdbcAppendStream")
    val readings = Jobs.parseSensors(Sources.kafkaStream(spark,
      c.get("BOOTSTRAP_SERVERS"), c.get("INCOMING_TOPIC"), c.get("GROUP_ID")))
    Sinks.jdbcAppendStream(readings, c.get("JDBC_URL"), c.get("TABLE"),
      c.get("JDBC_USER"), c.get("JDBC_PASSWORD"),
      c.getOrElse("CHECKPOINT_DIR", "/tmp/graft-ckpt/jdbc-append"))
      .start().awaitTermination()
  }
}

/** flinkBatchJDBCSink.scala (+ the 01 variant): text file → parse →
  * batch K3 upsert, one connection per partition. */
object BatchJdbcUpsertJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromFileAndArgs(args.head, args.tail)
    val spark = Jobs.session("batchJdbcUpsert")
    import spark.implicits._
    val readings = Jobs.parseSensors(
      Sources.textFile(spark, c.get("SRC_FILE_PATH"))).as[SensorReading]
    val url = c.get("JDBC_URL")
    val (user, pwd) = (c.get("JDBC_USER"), c.get("JDBC_PASSWORD"))
    new Sinks.JdbcUpsert(
      () => java.sql.DriverManager.getConnection(url, user, pwd),
      c.getOrElse("TABLE", "flinkdb.t_flnk_tempreture"))
      .writeBatch(readings)
  }
}

/** flinkTableJDBC.scala: text file → parse → plain JDBC append. */
object TableJdbcJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("tableJdbc")
    Sinks.jdbcAppend(
      Jobs.parseSensors(Sources.textFile(spark, c.get("SRC_FILE_PATH"))),
      c.get("JDBC_URL"), c.get("TABLE"), c.get("JDBC_USER"), c.get("JDBC_PASSWORD"))
  }
}

/** flinkTableJDBC02.scala: in-memory Book rows → JDBC append. */
object TableJdbcBooksJob {
  def main(args: Array[String]): Unit = {
    val c = AppConfig.fromArgs(args)
    val spark = Jobs.session("tableJdbcBooks")
    import spark.implicits._
    val books = Seq(
      Book(101L, "Stream Processing with Apache Flink", "Fabian Hueske, Vasiliki Kalavri", 2019),
      Book(102L, "Streaming Systems", "Tyler Akidau, Slava Chernyak, Reuven Lax", 2018),
      Book(103L, "Designing Data-Intensive Applications", "Martin Kleppmann", 2017),
      Book(104L, "Kafka: The Definitive Guide", "Gwen Shapira, Todd Palino", 2021)
    ).toDS()
    Sinks.jdbcAppend(books.toDF(), c.get("JDBC_URL"), c.get("TABLE"),
      c.get("JDBC_USER"), c.get("JDBC_PASSWORD"))
  }
}
