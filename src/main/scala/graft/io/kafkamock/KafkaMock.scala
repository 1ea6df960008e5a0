package graft.io.kafkamock

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * In-JVM mock Kafka broker + DataSourceV2 connector (`format
 * ("kafkamock")`) — the runtime-evidence harness for the S1/S2/K1/T6
 * operator rows (SURVEY.md §2.1/§2.2/§2.7; reference
 * flinkStreamProcessing.scala:93-103,162-186).
 *
 * The sandbox has no Kafka broker and no `spark-sql-kafka-0-10` /
 * `kafka-clients` jars (zero egress), so the real connector cannot
 * execute here. This connector reproduces the PROTOCOL surface the
 * production wiring depends on — and nothing else:
 *
 *  - the Kafka source schema (key/value binary, topic, partition,
 *    offset, timestamp, timestampType);
 *  - `subscribe` single-topic subscription over a fixed partition set;
 *  - `startingOffsets` resolved exactly like the real source: `latest`
 *    snapshots end offsets at stream start, `earliest` reads from
 *    offset 0, a specific-offset JSON (`{"t":{"0":23,"1":-1}}`, -2 =
 *    earliest, -1 = latest) pins per-partition starts, and
 *    `startingOffsetsByTimestamp` (`{"t":{"0":<ms>}}`) starts each
 *    partition at its first record at-or-after the timestamp; a
 *    timestamp matching no record follows
 *    `startingOffsetsByTimestampStrategy` like the real connector —
 *    default "error" fails the query (offsetsForTimes returned
 *    nothing), opt-in "latest" starts at the end; defaults are PER MODE
 *    (streaming latest, batch earliest, like the real connector); a
 *    checkpointed stream resumes from its serialized per-partition
 *    offsets instead (T6 replay);
 *  - per-partition monotone offsets; one input partition per topic
 *    partition (the real source's partition→task mapping);
 *  - `maxOffsetsPerTrigger` admission control (SupportsAdmissionControl):
 *    each micro-batch's total rows are capped, the cap spread across
 *    partitions in proportion to their lag, the remainder delivered by
 *    later triggers from the checkpointed cursor;
 *  - the sink's fire-and-forget append (at-least-once under epoch
 *    replay, exactly like Spark's Kafka sink — the §7.4 item-1 decision
 *    is reproduced, not papered over), `topic` option or per-row
 *    `topic` column routing (option wins), string-or-binary
 *    `value`/optional-`key` columns, keyed records hash-partitioned on
 *    the key like the default Kafka partitioner.
 *
 * `kafka.bootstrap.servers` is required and `kafka.group.id` accepted
 * (both recorded, neither dials anywhere) so the production option
 * wiring in [[graft.io.Sources.kafkaStream]] / [[graft.io.Sinks]] is
 * exercised verbatim — tests swap ONLY the format name.
 *
 * Executors share the driver JVM in local mode, so the broker state is
 * a process-global registry; this is a test/dev harness like
 * `MemoryStream`, not a networked broker.
 */
object MockBroker {
  final case class Record(key: Array[Byte], value: Array[Byte], ts: Long)

  private val topics = new ConcurrentHashMap[String, Array[ArrayBuffer[Record]]]()

  def createTopic(topic: String, partitions: Int = 1): Unit = {
    require(partitions >= 1, "partitions must be >= 1")
    val prev = topics.putIfAbsent(topic,
      Array.fill(partitions)(ArrayBuffer.empty[Record]))
    require(prev == null, s"topic '$topic' already exists")
  }

  def deleteTopic(topic: String): Unit = topics.remove(topic)

  private[kafkamock] def partitionsOf(topic: String): Array[ArrayBuffer[Record]] = {
    val p = topics.get(topic)
    if (p == null) throw new IllegalArgumentException(
      s"unknown topic '$topic' (mock brokers auto-create nothing — " +
      "MockBroker.createTopic first)")
    p
  }

  def numPartitions(topic: String): Int = partitionsOf(topic).length

  /** Produce one record. Keyed records go to hash(key) % partitions
    * (the default Kafka partitioner's stable routing); unkeyed ones
    * round-robin on the current total count. */
  def produce(topic: String, value: String, key: String = null): Unit = {
    val parts = partitionsOf(topic)
    val pid =
      if (key != null) math.floorMod(key.hashCode, parts.length)
      else math.floorMod(endOffsets(topic).sum.toInt, parts.length)
    produceTo(topic, pid, value, key)
  }

  /** `tsMillis` < 0 = stamp with the wall clock (production path); an
    * explicit record timestamp lets tests drive the timestamp-offset
    * resolution ([[offsetForTime]]) deterministically. */
  def produceTo(topic: String, partition: Int, value: String,
                key: String = null, tsMillis: Long = -1L): Unit = {
    val parts = partitionsOf(topic)
    val buf = parts(partition)
    val rec = Record(
      if (key == null) null else key.getBytes("UTF-8"),
      if (value == null) null else value.getBytes("UTF-8"),
      if (tsMillis < 0) System.currentTimeMillis() else tsMillis)
    buf.synchronized { buf += rec }
  }

  /** The earliest offset whose record timestamp is >= `tsMillis`, or
    * None when no record qualifies — `offsetsForTimes` returns null in
    * that case, and what happens next is a POLICY decision
    * (`startingOffsetsByTimestampStrategy`, resolved in
    * [[KafkaMock.resolveStart]]), not this lookup's. */
  def offsetForTime(topic: String, partition: Int,
                    tsMillis: Long): Option[Long] = {
    val buf = partitionsOf(topic)(partition)
    buf.synchronized {
      val i = buf.indexWhere(_.ts >= tsMillis)
      if (i < 0) None else Some(i.toLong)
    }
  }

  private[kafkamock] def appendRaw(topic: String, partition: Int,
                                   key: Array[Byte], value: Array[Byte]): Unit = {
    val buf = partitionsOf(topic)(partition)
    val rec = Record(key, value, System.currentTimeMillis())
    buf.synchronized { buf += rec }
  }

  def endOffsets(topic: String): Array[Long] =
    partitionsOf(topic).map(b => b.synchronized(b.length.toLong))

  private[kafkamock] def fetch(topic: String, partition: Int, from: Long,
                               until: Long): IndexedSeq[Record] = {
    val buf = partitionsOf(topic)(partition)
    buf.synchronized {
      buf.slice(from.toInt, math.min(until, buf.length).toInt).toIndexedSeq
    }
  }

  /** Test helper: all values currently in the topic, as strings, in
    * (partition, offset) order. */
  def valuesOf(topic: String): Seq[String] =
    partitionsOf(topic).toIndexedSeq.flatMap(b => b.synchronized(b.toIndexedSeq))
      .map(r => new String(r.value, "UTF-8"))
}

private[kafkamock] object KafkaMock {
  /** The real Kafka source's fixed read schema. */
  val readSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def requireBootstrap(options: CaseInsensitiveStringMap): Unit =
    require(options.containsKey("kafka.bootstrap.servers"),
      "Option 'kafka.bootstrap.servers' must be specified")

  /** `{"<topic>":{"0":12,"1":7}}` — the real source's offset JSON shape
    * (single subscribed topic). */
  def offsetsToJson(topic: String, offsets: Map[Int, Long]): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"$topic":{""", ",", "}}")

  private val entryRe = """"(\d+)"\s*:\s*(-?\d+)""".r

  def offsetsFromJson(json: String): Map[Int, Long] =
    entryRe.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap

  /** Per-partition start offsets for a scan, resolved exactly like the
    * real source: `startingOffsetsByTimestamp` JSON wins (each
    * partition starts at the first offset whose record timestamp >= its
    * ts) and must cover every partition; else `startingOffsets` —
    * "earliest"/"latest" named policies, or a specific-offset JSON
    * where -2 = earliest and -1 = latest; else `default` (per READ
    * MODE: streaming latest, batch earliest). A timestamp no record
    * qualifies for follows `tsStrategy`
    * (`startingOffsetsByTimestampStrategy`): the connector DEFAULT is
    * "error" — offsetsForTimes matched nothing, fail the query —
    * with "latest" (start at the partition end) the opt-in. */
  def resolveStart(topic: String, starting: Option[String],
                   byTimestamp: Option[String],
                   default: String,
                   tsStrategy: String = "error"): Map[Int, Long] = {
    val ends = MockBroker.endOffsets(topic)
    byTimestamp match {
      case Some(js) =>
        val ts = offsetsFromJson(js)
        ends.indices.map { p =>
          val t = ts.getOrElse(p, throw new IllegalArgumentException(
            s"startingOffsetsByTimestamp must specify every partition of " +
            s"'$topic'; missing partition $p"))
          p -> MockBroker.offsetForTime(topic, p, t).getOrElse {
            if (tsStrategy == "latest") ends(p)
            else throw new IllegalArgumentException(
              s"no offset matched timestamp $t for '$topic'-$p " +
              s"(startingOffsetsByTimestampStrategy=error; set it to " +
              s"'latest' to start at the end instead)")
          }
        }.toMap
      case None => starting.getOrElse(default) match {
        case "earliest" => ends.indices.map(_ -> 0L).toMap
        case "latest" => ends.indices.map(p => p -> ends(p)).toMap
        case js =>
          val offs = offsetsFromJson(js)
          ends.indices.map { p =>
            val o = offs.getOrElse(p, throw new IllegalArgumentException(
              s"startingOffsets JSON must specify every partition of " +
              s"'$topic'; missing partition $p"))
            p -> (o match {
              case -2L => 0L
              case -1L => ends(p)
              case n => n
            })
          }.toMap
      }
    }
  }
}

final case class MockOffset(topic: String, offsets: Map[Int, Long]) extends Offset {
  override def json: String = KafkaMock.offsetsToJson(topic, offsets)
}

/** `format("kafkamock")` (registered via META-INF/services) or the full
  * class name `graft.io.kafkamock.KafkaMockProvider`. */
class KafkaMockProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafkamock"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaMock.readSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new MockTable(new CaseInsensitiveStringMap(properties))
}

final class MockTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {

  KafkaMock.requireBootstrap(options) // at table resolution, like the real connector

  override def name(): String = "kafkamock:" +
    Option(options.get("subscribe")).orElse(Option(options.get("topic")))
      .getOrElse("<unbound>")

  override def schema(): StructType = KafkaMock.readSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder = {
    KafkaMock.requireBootstrap(readOptions)
    val topic = readOptions.get("subscribe")
    require(topic != null, "Option 'subscribe' must be specified for reads")
    // the raw option, NOT a resolved default: the real connector's
    // default is PER MODE — streaming starts at latest, batch reads the
    // whole topic from earliest — and the mode is only known at
    // toBatch/toMicroBatchStream time, so MockScan resolves it there
    val starting = readOptions.get("startingOffsets")
    require(starting == null || starting == "latest" ||
      starting == "earliest" || starting.trim.startsWith("{"),
      s"startingOffsets must be earliest|latest|<offset json>, got '$starting'")
    val byTs = readOptions.get("startingOffsetsByTimestamp")
    require(byTs == null || byTs.trim.startsWith("{"),
      s"startingOffsetsByTimestamp must be a per-partition ts JSON, got '$byTs'")
    require(starting == null || byTs == null,
      "set only one of startingOffsets / startingOffsetsByTimestamp")
    val ending = readOptions.getOrDefault("endingOffsets", "latest")
    require(ending == "latest",
      s"endingOffsets supports only 'latest', got '$ending'")
    val tsStrategy = readOptions.getOrDefault(
      "startingOffsetsByTimestampStrategy", "error")
    require(tsStrategy == "error" || tsStrategy == "latest",
      s"startingOffsetsByTimestampStrategy must be error|latest, " +
      s"got '$tsStrategy'")
    val maxPerTrigger = Option(readOptions.get("maxOffsetsPerTrigger"))
      .map(_.toLong)
    require(maxPerTrigger.forall(_ > 0L),
      s"maxOffsetsPerTrigger must be positive, got $maxPerTrigger")
    () => new MockScan(topic, Option(starting), Option(byTs), tsStrategy,
      maxPerTrigger)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    KafkaMock.requireBootstrap(info.options())
    val schema = info.schema()
    // the real sink's routing precedence: the 'topic' OPTION pins every
    // record; without it each row must carry a string 'topic' column
    val topic = Option(info.options().get("topic"))
    require(topic.isDefined ||
      schema.fields.exists(f => f.name == "topic" &&
        f.dataType == StringType),
      "set the 'topic' option or carry a string 'topic' column")
    require(schema.fieldNames.contains("value"),
      "the input must carry a 'value' column")
    Seq("key", "value").foreach { c =>
      schema.fields.find(_.name == c).foreach { f =>
        require(f.dataType == StringType || f.dataType == BinaryType,
          s"column '$c' must be STRING or BINARY, got ${f.dataType.sql}")
      }
    }
    new WriteBuilder {
      override def build(): Write = new MockWrite(topic, schema)
    }
  }
}

final class MockScan(topic: String, startingOffsets: Option[String],
                     byTimestamp: Option[String],
                     tsStrategy: String = "error",
                     maxPerTrigger: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = KafkaMock.readSchema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MockMicroBatchStream(topic, startingOffsets, byTimestamp, tsStrategy,
      maxPerTrigger)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val ends = MockBroker.endOffsets(topic)
      // batch default = EARLIEST (the real connector reads the whole
      // topic on a plain spark.read; only streaming defaults to latest)
      val from = KafkaMock.resolveStart(topic, startingOffsets,
        byTimestamp, default = "earliest", tsStrategy = tsStrategy)
      ends.indices.map { p =>
        MockInputPartition(topic, p, from(p), ends(p)): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new MockReaderFactory
  }
}

final class MockMicroBatchStream(topic: String,
                                 startingOffsets: Option[String],
                                 byTimestamp: Option[String],
                                 tsStrategy: String = "error",
                                 maxPerTrigger: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset =
    MockOffset(topic, KafkaMock.resolveStart(topic, startingOffsets,
      byTimestamp, default = "latest", tsStrategy = tsStrategy))

  override def latestOffset(): Offset =
    MockOffset(topic,
      MockBroker.endOffsets(topic).zipWithIndex.map(_.swap).toMap)

  /** `maxOffsetsPerTrigger` rate limiting, the real connector's
    * admission-control surface: the TOTAL rows per micro-batch are
    * capped and the cap is spread across partitions in proportion to
    * each one's available lag (the connector's rateLimit shape — a
    * hot partition gets most of the budget, an idle one none). The
    * un-capped remainder stays in the broker and the next trigger
    * picks it up from the checkpointed cursor. */
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.fold(ReadLimit.allAvailable())(n => ReadLimit.maxRows(n))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val ends = MockBroker.endOffsets(topic)
    val s = start.asInstanceOf[MockOffset].offsets
    limit match {
      case m: ReadMaxRows =>
        val avail = ends.zipWithIndex.map { case (e, p) =>
          p -> math.max(0L, e - s.getOrElse(p, 0L)) }
        val total = avail.map(_._2).sum
        if (total <= m.maxRows())
          MockOffset(topic, ends.zipWithIndex.map(_.swap).toMap)
        else {
          // proportional split, floor-rounded; guarantee progress by
          // granting at least one row to some lagging partition when
          // rounding zeroes everything out
          val granted = avail.map { case (p, a) =>
            p -> (m.maxRows() * a / total) }.toMap
          val fixed =
            if (granted.values.sum == 0L)
              avail.find(_._2 > 0L).map { case (p, _) =>
                granted.updated(p, 1L) }.getOrElse(granted)
            else granted
          MockOffset(topic, avail.map { case (p, _) =>
            p -> (s.getOrElse(p, 0L) + fixed(p)) }.toMap)
        }
      case _ =>
        MockOffset(topic, ends.zipWithIndex.map(_.swap).toMap)
    }
  }

  override def deserializeOffset(json: String): Offset =
    MockOffset(topic, KafkaMock.offsetsFromJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MockOffset].offsets
    val e = end.asInstanceOf[MockOffset].offsets
    e.toSeq.sortBy(_._1).map { case (p, until) =>
      MockInputPartition(topic, p, s.getOrElse(p, 0L), until): InputPartition
    }.filter { ip =>
      val m = ip.asInstanceOf[MockInputPartition]; m.from < m.until
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MockReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class MockInputPartition(topic: String, partition: Int,
                                    from: Long, until: Long) extends InputPartition

final class MockReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MockInputPartition]
    new PartitionReader[InternalRow] {
      private val records = MockBroker.fetch(p.topic, p.partition, p.from, p.until)
      private var i = -1
      override def next(): Boolean = { i += 1; i < records.length }
      override def get(): InternalRow = {
        val r = records(i)
        new GenericInternalRow(Array[Any](
          r.key, r.value, UTF8String.fromString(p.topic), p.partition,
          p.from + i, r.ts * 1000L /* millis → micros */, 0))
      }
      override def close(): Unit = ()
    }
  }
}

/** Ships to executors — a top-level serializable case class (an inner
  * anonymous factory would drag a non-serializable `$outer` along). */
final case class MockWriterFactory(topic: Option[String], schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MockDataWriter(topic, schema)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new MockDataWriter(topic, schema)
}

final class MockWrite(topic: Option[String], schema: StructType) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      MockWriterFactory(topic, schema)
    override def commit(messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      MockWriterFactory(topic, schema)
    // fire-and-forget like the real Kafka sink: records are already
    // appended by the tasks — a replayed epoch re-appends (at-least-once)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

private object MockCommit extends WriterCommitMessage

final class MockDataWriter(topic: Option[String], schema: StructType)
    extends DataWriter[InternalRow] {
  private val valueIdx = schema.fieldIndex("value")
  private val valueIsString = schema(valueIdx).dataType == StringType
  private val keyIdx = if (schema.fieldNames.contains("key"))
    schema.fieldIndex("key") else -1
  private val keyIsString = keyIdx >= 0 && schema(keyIdx).dataType == StringType
  // the topic OPTION pins routing; otherwise the per-row column decides
  private val topicIdx =
    if (topic.isEmpty) schema.fieldIndex("topic") else -1

  private def bytes(row: InternalRow, idx: Int, isString: Boolean): Array[Byte] =
    if (row.isNullAt(idx)) null
    else if (isString) row.getUTF8String(idx).getBytes
    else row.getBinary(idx)

  override def write(row: InternalRow): Unit = {
    val t = topic.getOrElse {
      require(!row.isNullAt(topicIdx),
        "null topic: no 'topic' option and the row's topic column is null")
      row.getUTF8String(topicIdx).toString
    }
    val nParts = MockBroker.numPartitions(t)
    val key = if (keyIdx < 0) null else bytes(row, keyIdx, keyIsString)
    val value = bytes(row, valueIdx, valueIsString)
    // default-partitioner routing: keyed → stable hash; unkeyed → the
    // writing task's partition id (sticky, like the real producer)
    val pid =
      if (key != null) math.floorMod(java.util.Arrays.hashCode(key), nParts)
      else math.floorMod(org.apache.spark.TaskContext.getPartitionId(), nParts)
    MockBroker.appendRaw(t, pid, key, value)
  }

  override def commit(): WriterCommitMessage = MockCommit
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
