package graft.io

import java.io.FileInputStream
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Source operators S1-S6 (SURVEY.md §2.1), Spark-first.
 *
 * Every source yields a single-column `value: string` DataFrame (the
 * reference's `SimpleStringSchema` shape); schema application is the
 * separate P1 step ([[graft.ops.Csv.parse]]), so the same downstream
 * pipeline runs over any source, batch or streaming (T5 unified-mode
 * design, reference runs the same DataStream code in STREAMING and BATCH).
 *
 * Kafka needs the `spark-sql-kafka-0-10` connector on the cluster
 * classpath; these builders only declare options, mirroring
 * reference flinkStreamProcessing.scala:93-103.
 */
object Sources {

  /** S1/S2: Kafka topic subscription, value-only strings.
    * `startingOffsets`: "latest" (reference default), "earliest", or a
    * per-partition OFFSET JSON. The reference's commented timestamp
    * init (flinkStreamProcessing.scala:98-99) maps to the connector's
    * separate `startingOffsetsByTimestamp` option — pass the
    * per-partition ms JSON (`{"topic":{"0":<ms>}}`) as
    * `startingTimestamps` and leave `startingOffsets` at its default
    * (the connector refuses both together, T6). A timestamp no record
    * qualifies for follows `timestampStrategy`
    * (`startingOffsetsByTimestampStrategy`): the connector default is
    * "error" (fail the query); "latest" starts that partition at its
    * end. `format` swaps the connector implementation — "kafka" (the
    * real connector, default) or "kafkamock"
    * ([[graft.io.kafkamock.KafkaMockProvider]], the in-JVM protocol
    * twin the e2e tests run this exact wiring through). */
  def kafkaStream(spark: SparkSession, brokers: String, topic: String,
                  groupId: String, startingOffsets: String = "latest",
                  format: String = "kafka",
                  startingTimestamps: Option[String] = None,
                  timestampStrategy: String = "error"): DataFrame = {
    val base = spark.readStream.format(format)
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
    startingTimestamps
      .fold(base.option("startingOffsets", startingOffsets))(ts =>
        base.option("startingOffsetsByTimestamp", ts)
          .option("startingOffsetsByTimestampStrategy", timestampStrategy))
      .load()
      .select(col("value").cast("string").as("value"))
  }

  /** S1 bounded variant: batch replay of a topic (Spark's unified API —
    * the reference reruns the same job in BATCH runtime mode, T5). */
  def kafkaBatch(spark: SparkSession, brokers: String, topic: String,
                 format: String = "kafka"): DataFrame =
    spark.read.format(format)
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()
      .select(col("value").cast("string").as("value"))

  /** S3: socket text source (reference flinkStarter.scala:12). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** S4: batch text file (reference flinkBatchJDBCSink.scala:44-47). */
  def textFile(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).select(col("value").cast("string"))

  /** S4 streaming twin: watch a directory for new files. */
  def textFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir).select(col("value").cast("string"))

  /** S5: in-memory collection (reference flinkStreamTable.scala:61-65). */
  def memoryLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.toDF("value")
  }

  /** S6: properties-file / CLI config (reference ParameterTool,
    * flinkStreamProcessing.scala:41-64). Precedence: CLI `--key value`
    * pairs override file entries. */
  final case class AppConfig(props: Map[String, String]) {
    def get(key: String): String = props.getOrElse(key,
      throw new IllegalArgumentException(s"missing config key: $key"))
    def getOrElse(key: String, default: String): String = props.getOrElse(key, default)
  }

  object AppConfig {
    def fromPropertiesFile(path: String): AppConfig = {
      val p = new Properties()
      val in = new FileInputStream(path)
      try p.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      AppConfig(p.asScala.toMap)
    }

    /** `--key value` argument pairs, like ParameterTool.fromArgs. */
    def fromArgs(args: Array[String]): AppConfig =
      AppConfig(args.sliding(2, 2).collect {
        case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      }.toMap)

    def fromFileAndArgs(path: String, args: Array[String]): AppConfig =
      AppConfig(fromPropertiesFile(path).props ++ fromArgs(args).props)
  }
}
