package graft.io

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.kafkamock.MockBroker
import graft.ops.{Csv, Transforms}

/**
 * Runtime evidence for the S1/S2/K1/T6 operator rows (SURVEY.md §2.1,
 * §2.2, §2.7): the PRODUCTION wiring — [[Sources.kafkaStream]] /
 * [[Sources.kafkaBatch]] / [[Sinks.kafkaStream]], exactly as the jobs
 * in [[graft.jobs]] call it — executed end-to-end against the in-JVM
 * mock broker ([[graft.io.kafkamock]]), which reproduces the Kafka
 * connector's protocol surface (subscribe, startingOffsets
 * earliest/latest, per-partition offsets, checkpointed resume, keyed
 * hash-partitioned writes, at-least-once fire-and-forget sink). The
 * sandbox has no broker and no Kafka jars, so this is the strongest
 * executable evidence available; only the format name differs from
 * production ("kafkamock" vs "kafka") — every option, schema, and
 * transform in between is the production code path.
 */
class KafkaMockSpec extends SparkSpec {

  private val brokers = "mockhost:9092" // recorded, never dialed
  private var n = 0
  private def freshTopic(parts: Int): String = {
    n += 1; val t = s"kmock-t$n"; MockBroker.createTopic(t, parts); t
  }
  private def ckpt(): String =
    Files.createTempDirectory("kmock-ckpt").toString

  /** The reference app's input lines: NYSE daily-price CSV. */
  private val lines = Seq(
    "NYSE,ABB,2010-03-05,10.0,50.0,9.0,12.0,100,12.0",
    "NYSE,IBM,2010-07-09,20.0,60.0,19.0,22.0,200,22.0",
    "NYSE,CAT,2011-01-02,30.0,70.0,29.0,32.0,300,32.0",
    "NYSE,GE,2010-05-05,40.0,80.0,39.0,42.0,400,42.0",
    "NYSE,MSO,2011-09-09,50.0,50.0,10.0,52.0,500,52.0",
    "NYSE,ABB,2012-11-11,11.0,90.0,10.5,13.0,150,13.0")

  /** flinkStreamProcessing's three branches (symbol-set, threshold,
    * compound), enriched to CSV `value` lines and recombined — the
    * full job dataflow over any source of raw lines. */
  private def threeBranchPipeline(raw: DataFrame, topic: String): DataFrame = {
    val prices = Csv.parse(raw, Csv.dailyPriceSchema)
    val clock = Some(1234L) // injectable clock (SURVEY §5 item 6)
    val b1 = Transforms.enrichCsvLine(
      Transforms.symbolSetFilter(prices, Seq("ABB", "IBM", "CAT")), topic, clock)
    val b2 = Transforms.enrichCsvLine(
      Transforms.thresholdFilter(prices, "GE", 75.0, 5.0), topic, clock)
    val b3 = Transforms.enrichCsvLine(
      Transforms.compoundFilter(prices, Seq("ABB", "IBM", "CAT"), 50.0, 10.0,
        2010, 2011), topic, clock)
    b1.unionByName(b2).unionByName(b3)
  }

  test("S1+K1 e2e: source → parse → 3 filter branches → sink through the mock broker (earliest)") {
    val in = freshTopic(parts = 3)
    val out = freshTopic(parts = 2)
    // keyed produce → stable hash routing across the 3 partitions
    lines.foreach(l => MockBroker.produce(in, l, key = l.split(",")(1)))

    val raw = Sources.kafkaStream(spark, brokers, in, "graft-e2e",
      startingOffsets = "earliest", format = "kafkamock")
    val q = Sinks.kafkaStream(threeBranchPipeline(raw, in), brokers, out,
      ckpt(), format = "kafkamock").start()
    try q.processAllAvailable() finally q.stop()

    // the batch twin over the same lines IS the expected output (T5
    // unified batch/stream: same LogicalPipeline both modes)
    val expected = threeBranchPipeline(
      Sources.memoryLines(spark, lines), in)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(MockBroker.valuesOf(out).sorted == expected)
    // 4 symbol-set rows + 1 threshold row + 2 compound rows
    assert(expected.size == 7)
  }

  test("T6: startingOffsets latest skips pre-existing records, sees only post-start produces") {
    val in = freshTopic(parts = 2)
    val out = freshTopic(parts = 1)
    MockBroker.produce(in, lines(0)) // pre-existing: must be skipped
    MockBroker.produce(in, lines(1))

    val raw = Sources.kafkaStream(spark, brokers, in, "graft-e2e",
      startingOffsets = "latest", format = "kafkamock")
    val q = Sinks.kafkaStream(threeBranchPipeline(raw, in), brokers, out,
      ckpt(), format = "kafkamock").start()
    try {
      q.processAllAvailable() // forces initialOffset to snapshot NOW
      MockBroker.produce(in, lines(2)) // CAT — passes branch 1 and 3
      q.processAllAvailable()
    } finally q.stop()

    val got = MockBroker.valuesOf(out)
    // CAT passes only the symbol-set branch (high/low miss the others)
    assert(got.size == 1 && got.forall(_.contains(",CAT,")),
      s"latest-offset stream must see only the post-start CAT line, got $got")
  }

  test("T6: checkpointed stream resumes from its committed offsets — no loss, no duplicates") {
    val in = freshTopic(parts = 3)
    val out = freshTopic(parts = 1)
    val dir = ckpt()
    def run(): Unit = {
      val raw = Sources.kafkaStream(spark, brokers, in, "graft-e2e",
        startingOffsets = "earliest", format = "kafkamock")
      val q = Sinks.kafkaStream(threeBranchPipeline(raw, in), brokers, out,
        dir, format = "kafkamock").start()
      try q.processAllAvailable() finally q.stop()
    }
    lines.take(3).foreach(l => MockBroker.produce(in, l, key = l))
    run() // first incarnation consumes lines 0-2
    lines.drop(3).foreach(l => MockBroker.produce(in, l, key = l))
    run() // resumed incarnation must consume ONLY lines 3-5

    val expected = threeBranchPipeline(Sources.memoryLines(spark, lines), in)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(MockBroker.valuesOf(out).sorted == expected,
      "restart from checkpoint must deliver each input exactly once")
  }

  test("T6: timestamp start (startingOffsetsByTimestamp) begins each " +
    "partition at its first record at-or-after the ts — the reference's " +
    "commented timestamp init, executed through the production wiring") {
    val in = freshTopic(parts = 2)
    val out = freshTopic(parts = 1)
    // two epochs of records with explicit timestamps: the stream must
    // skip the t=1000 epoch and read from t=2000 on — per partition
    MockBroker.produceTo(in, 0, lines(0), tsMillis = 1000L) // skipped
    MockBroker.produceTo(in, 1, lines(1), tsMillis = 1000L) // skipped
    MockBroker.produceTo(in, 0, lines(2), tsMillis = 2000L) // CAT: read
    MockBroker.produceTo(in, 1, lines(3), tsMillis = 2500L) // GE: read

    val tsJson = s"""{"$in":{"0":2000,"1":2000}}"""
    val raw = Sources.kafkaStream(spark, brokers, in, "graft-e2e",
      format = "kafkamock", startingTimestamps = Some(tsJson))
    val q = Sinks.kafkaStream(threeBranchPipeline(raw, in), brokers, out,
      ckpt(), format = "kafkamock").start()
    try q.processAllAvailable() finally q.stop()

    // the batch twin over ONLY the t>=2000 lines is the expected
    // output; any epoch-1 leakage (ABB/IBM rows) breaks the equality
    val expected = threeBranchPipeline(
      Sources.memoryLines(spark, Seq(lines(2), lines(3))), in)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(expected.nonEmpty &&
      MockBroker.valuesOf(out).sorted == expected,
      s"timestamp start must begin at the t>=2000 records only, got " +
      s"${MockBroker.valuesOf(out)}")
  }

  test("T6: a timestamp past every record FAILS under the connector's " +
    "default startingOffsetsByTimestampStrategy=error (offsetsForTimes " +
    "matched nothing)") {
    val in = freshTopic(parts = 1)
    MockBroker.produceTo(in, 0, lines(0), tsMillis = 1000L)
    val raw = Sources.kafkaStream(spark, brokers, in, "graft-e2e",
      format = "kafkamock",
      startingTimestamps = Some(s"""{"$in":{"0":5000}}"""))
    val q = Sinks.kafkaStream(threeBranchPipeline(raw, in), brokers,
      freshTopic(parts = 1), ckpt(), format = "kafkamock").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t => Option(t.getMessage)
        .exists(_.contains("startingOffsetsByTimestampStrategy"))),
      s"beyond-end ts must fail loudly under strategy=error, got $e")
  }

  test("T6: a timestamp past every record resolves to the END offset " +
    "under strategy=latest — the stream sees only later produces") {
    val in = freshTopic(parts = 1)
    val out = freshTopic(parts = 1)
    MockBroker.produceTo(in, 0, lines(0), tsMillis = 1000L)
    val raw = Sources.kafkaStream(spark, brokers, in, "graft-e2e",
      format = "kafkamock",
      startingTimestamps = Some(s"""{"$in":{"0":5000}}"""),
      timestampStrategy = "latest")
    val q = Sinks.kafkaStream(threeBranchPipeline(raw, in), brokers, out,
      ckpt(), format = "kafkamock").start()
    try {
      q.processAllAvailable()
      MockBroker.produceTo(in, 0, lines(2), tsMillis = 9000L) // CAT
      q.processAllAvailable()
    } finally q.stop()
    val expected = threeBranchPipeline(
      Sources.memoryLines(spark, Seq(lines(2))), in)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(expected.nonEmpty &&
      MockBroker.valuesOf(out).sorted == expected,
      s"ts-past-end must behave like latest, got ${MockBroker.valuesOf(out)}")
  }

  test("S1: maxOffsetsPerTrigger caps each micro-batch (admission " +
    "control), spread across partitions by lag, nothing lost or " +
    "duplicated across triggers") {
    val in = freshTopic(parts = 2)
    // 6 records on p0, 3 on p1: the proportional split must favor the
    // lagging partition while the TOTAL stays under the cap
    (0 until 6).foreach(i => MockBroker.produceTo(in, 0, s"a$i"))
    (0 until 3).foreach(i => MockBroker.produceTo(in, 1, s"b$i"))
    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val q = spark.readStream.format("kafkamock")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", in)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", "4")
      .load()
      .select(col("value").cast("string").as("value"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val vs = df.collect().map(_.getString(0))
        sizes.synchronized { sizes += vs.length.toLong; seen ++= vs }
        ()
      }
      .option("checkpointLocation", ckpt()).start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.sorted == ((0 until 6).map(i => s"a$i") ++
      (0 until 3).map(i => s"b$i")).sorted,
      s"exactly-once delivery across rate-limited triggers, got $seen")
    assert(sizes.forall(_ <= 4L),
      s"every micro-batch must respect the 4-row cap: $sizes")
    assert(sizes.count(_ > 0L) >= 3,
      s"the cap must force the backlog across multiple triggers: $sizes")
  }

  test("S1: specific-offset JSON start (-2 earliest, -1 latest, pinned n)") {
    val in = freshTopic(parts = 3)
    // one line per explicit partition: p0 via -2 (earliest), p1 via -1
    // (latest → skipped), p2 via a pinned absolute offset 0
    lines.take(3).zipWithIndex.foreach { case (l, p) =>
      MockBroker.produceTo(in, p, l) }
    val got = spark.read.format("kafkamock")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", in)
      .option("startingOffsets", s"""{"$in":{"0":-2,"1":-1,"2":0}}""")
      .load().select(col("value").cast("string"), col("partition"))
      .collect().map(r => (r.getInt(1), r.getString(0))).toSeq
    assert(got.map(_._1).toSet == Set(0, 2),
      s"partition 1 pinned to latest must yield nothing, got $got")
  }

  test("S1: a plain batch read with no startingOffsets defaults to " +
    "EARLIEST (whole topic), like the real connector") {
    val in = freshTopic(parts = 2)
    lines.take(4).foreach(l => MockBroker.produce(in, l))
    val got = spark.read.format("kafkamock")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", in)
      .load().select(col("value").cast("string"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == lines.take(4).sorted,
      "batch default must be earliest — a silent zero-row read is the " +
      "mock diverging from the real connector")
  }

  test("S1 batch twin: kafkaBatch replays the whole topic earliest→latest") {
    val in = freshTopic(parts = 3)
    lines.foreach(l => MockBroker.produce(in, l, key = l.split(",")(1)))
    val got = Sources.kafkaBatch(spark, brokers, in, format = "kafkamock")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == lines.sorted)
  }

  test("K1: per-row 'topic' column routes each record when no topic " +
    "option is set; the option wins when both are present") {
    val t1 = freshTopic(parts = 1)
    val t2 = freshTopic(parts = 1)
    import spark.implicits._
    val batch = Seq((t1, "to-one"), (t2, "to-two"), (t1, "also-one"))
      .toDF("topic", "value")
    batch.write.format("kafkamock")
      .option("kafka.bootstrap.servers", brokers).mode("append").save()
    assert(MockBroker.valuesOf(t1).sorted == Seq("also-one", "to-one"))
    assert(MockBroker.valuesOf(t2) == Seq("to-two"))

    // precedence: the option pins routing regardless of the column
    val t3 = freshTopic(parts = 1)
    batch.write.format("kafkamock")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", t3).mode("append").save()
    assert(MockBroker.valuesOf(t3).sorted ==
      Seq("also-one", "to-one", "to-two"))

    // neither option nor column: refused loudly
    val e = intercept[Exception] {
      Seq("x").toDF("value").write.format("kafkamock")
        .option("kafka.bootstrap.servers", brokers).mode("append").save()
    }
    assert(e.getMessage.contains("topic"))
  }

  test("option wiring parity: missing bootstrap servers / unknown topic fail loudly") {
    val e1 = intercept[Exception] {
      spark.read.format("kafkamock").option("subscribe", "whatever").load()
    }
    assert(e1.getMessage.contains("kafka.bootstrap.servers"))
    val e2 = intercept[Exception] {
      Sources.kafkaBatch(spark, brokers, "no-such-topic", format = "kafkamock")
        .collect()
    }
    assert(e2.getMessage != null)
  }

  test("K1 semantics: keyed writes route stably by key hash; sink is at-least-once by design") {
    val out = freshTopic(parts = 4)
    import spark.implicits._
    val df = Seq(("k1", "v1"), ("k1", "v2"), ("k2", "v3"))
      .toDF("key", "value")
    df.write.format("kafkamock").mode("append")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", out).save()
    // same key → same partition (the default partitioner's contract)
    val ends = MockBroker.endOffsets(out)
    assert(ends.sum == 3)
    assert(ends.count(_ > 0) <= 2, "k1's two records must share a partition")
    assert(MockBroker.valuesOf(out).sorted == Seq("v1", "v2", "v3"))
  }
}
