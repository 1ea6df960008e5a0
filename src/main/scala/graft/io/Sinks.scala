package graft.io

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.model.SensorReading

/**
 * Sink operators K1-K7 (SURVEY.md §2.2), Spark-first.
 *
 * Delivery-semantics note (§7.4 item 1): Spark's Kafka/JDBC sinks are
 * at-least-once under retries; the reference's transactional exactly-once
 * producer (K1) is deliberately NOT faked. K3 reproduces the reference's
 * accumulate-on-update protocol (`sensor_temp = sensor_temp + ?`,
 * `iteration + 1`), so a task retry/replay double-accumulates — it is
 * at-least-once, NOT replay-idempotent. Replay-sensitive paths should use
 * [[JdbcEpochIdempotent]], whose epoch marker makes re-delivery a no-op.
 */
object Sinks {

  /** K5: console — batch `show`, streaming format("console"). */
  def consoleStream[T](ds: Dataset[T], outputMode: String = "append"): DataStreamWriter[T] =
    ds.writeStream.format("console").outputMode(outputMode)

  /** K1: Kafka value sink. The input must have a `value` string column
    * (use [[graft.ops.Csv.format]]). At-least-once; pair with
    * idempotent/dedup-on-read consumers for effective exactly-once.
    * `format` swaps the connector: "kafka" (default) or "kafkamock"
    * (the in-JVM protocol twin the e2e tests drive this wiring with). */
  def kafkaStream(df: DataFrame, brokers: String, topic: String,
                  checkpointDir: String,
                  format: String = "kafka"): DataStreamWriter[Row] =
    df.writeStream.format(format)
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /**
   * K2: rolling file sink. Reference policy (flinkContinuousProcessingRollover
   * .scala:165-194): hourly buckets `yyyy-MM-dd--HH`, roll by interval /
   * part size. Spark mapping: `partitionBy` on an ingest-hour bucket
   * column + processing-time trigger for cadence + `maxRecordsPerFile`
   * bounding part size by records. For the reference's bytes-exact 10 MB
   * cap use [[writeRollingBytes]] via foreachBatch.
   */
  def rollingTextFiles(df: DataFrame, path: String, checkpointDir: String,
                       triggerInterval: String = "15 minutes",
                       maxRecordsPerFile: Long = 1000000): DataStreamWriter[Row] =
    df.withColumn("bucket", date_format(current_timestamp(), "yyyy-MM-dd--HH"))
      .writeStream.format("csv")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .trigger(Trigger.ProcessingTime(triggerInterval))

  /**
   * K2, bytes-exact: rolls part files at `maxBytes` like the reference's
   * `withMaxPartSize(10 MB)` — and with the SAME granularity: Flink's
   * rolling policy is per subtask, so here each PARTITION writes its own
   * `part-<epoch>-<partition>-<seq>` files under `bucket=<hour>/`,
   * starting a new one once the current file crosses the byte cap (a
   * file can overshoot by at most one record, exactly like Flink, which
   * also checks size between records). Writes go through the Hadoop
   * FileSystem API, so any `hdfs://`/`s3a://`/local URI works; file
   * names are deterministic per (epoch, partition), so a replayed epoch
   * overwrites its own files instead of duplicating them.
   *
   * Wire into a stream as `.writeStream.foreachBatch(writeRollingBytes(
   * path, maxBytes)).trigger(...)` — the trigger interval supplies the
   * reference's rollover-interval dimension.
   */
  def writeRollingBytes(path: String, maxBytes: Long = 10L * 1024 * 1024,
                        valueCol: String = "value")
                       (batch: DataFrame, epochId: Long): Unit = {
    val bucket = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd--HH").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    val conf = new org.apache.spark.util.SerializableConfiguration(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    batch.select(col(valueCol).cast("string")).rdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val dir = new org.apache.hadoop.fs.Path(s"$path/bucket=$bucket")
      val fs = dir.getFileSystem(conf.value)
      var seq = 0
      var out: java.io.OutputStream = null
      var written = 0L
      def roll(): Unit = {
        if (out != null) out.close()
        out = fs.create(
          new org.apache.hadoop.fs.Path(dir, f"part-$epochId-$pid%05d-$seq%04d.txt"),
          true)
        seq += 1; written = 0L
      }
      try {
        rows.foreach { r =>
          if (out == null || written >= maxBytes) roll()
          val bytes = (r.getString(0) + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.write(bytes)
          written += bytes.length
        }
      } finally if (out != null) out.close()
    }
  }

  /** K6: columnar file sink (the reference's HDFS sink stub, done right):
    * any hadoop-compatible URI works (`hdfs://…`, `s3a://…`, local). */
  def parquetStream(df: DataFrame, path: String, checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)

  /** K7: single text file, overwrite (reference writeAsText+parallelism 1
    * — only sane for small outputs; keep the coalesce explicit). */
  def textOverwrite(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").text(path)

  // ------------------------------------------------------------------ JDBC

  /**
   * K3: the reference's hand-rolled JDBC upsert protocol
   * (flinkStreamingJDBCSink.scala:138-222): per partition open a
   * connection + two prepared statements; per record run UPDATE
   * (`sensor_temp = sensor_temp + ?`, `iteration = iteration + 1`) and
   * fall back to INSERT when no row matched. The accumulate-on-update
   * semantics are the reference's, reproduced verbatim.
   *
   * `connect` is a serializable thunk so executors open their own
   * connections (one per partition, like one per Flink task slot) and
   * tests can inject a fake.
   */
  final case class UpsertSql(table: String) {
    val update: String =
      s"UPDATE $table SET sensor_ts = ?, sensor_temp = sensor_temp + ?, " +
        "iteration = iteration + 1 WHERE sensor_id = ?"
    val insert: String =
      s"INSERT INTO $table (sensor_id, sensor_ts, sensor_temp, iteration) " +
        "VALUES (?, ?, ?, 1)"
  }

  class JdbcUpsert(connect: () => Connection, table: String) extends Serializable {
    private val sql = UpsertSql(table)

    /** The K3 record protocol, shared by batch and streaming paths. */
    def upsertAll(conn: Connection, rows: Iterator[SensorReading]): Unit = {
      val upd = conn.prepareStatement(sql.update)
      val ins = conn.prepareStatement(sql.insert)
      try {
        rows.foreach { r =>
          upd.setLong(1, r.sensorTStamp)
          upd.setFloat(2, r.sensorTemp)
          upd.setString(3, r.sensorId)
          if (upd.executeUpdate() == 0) {
            ins.setString(1, r.sensorId)
            ins.setLong(2, r.sensorTStamp)
            ins.setFloat(3, r.sensorTemp)
            ins.executeUpdate()
          }
        }
      } finally { upd.close(); ins.close() }
    }

    /** Batch path: one connection per partition
      * (reference flinkBatchJDBCSink.scala:79-135). */
    def writeBatch(ds: Dataset[SensorReading]): Unit =
      ds.foreachPartition { (it: Iterator[SensorReading]) =>
        val conn = connect()
        try upsertAll(conn, it) finally conn.close()
      }

    /** Streaming path: ForeachWriter, open/process/close mapping 1:1 onto
      * the reference RichSinkFunction lifecycle. */
    def foreachWriter: ForeachWriter[SensorReading] =
      new ForeachWriter[SensorReading] {
        @transient private var conn: Connection = _
        @transient private var upd: PreparedStatement = _
        @transient private var ins: PreparedStatement = _
        override def open(partitionId: Long, epochId: Long): Boolean = {
          conn = connect()
          upd = conn.prepareStatement(sql.update)
          ins = conn.prepareStatement(sql.insert)
          true
        }
        override def process(r: SensorReading): Unit = {
          upd.setLong(1, r.sensorTStamp)
          upd.setFloat(2, r.sensorTemp)
          upd.setString(3, r.sensorId)
          if (upd.executeUpdate() == 0) {
            ins.setString(1, r.sensorId)
            ins.setLong(2, r.sensorTStamp)
            ins.setFloat(3, r.sensorTemp)
            ins.executeUpdate()
          }
        }
        override def close(errorOrNull: Throwable): Unit = {
          if (upd != null) upd.close()
          if (ins != null) ins.close()
          if (conn != null) conn.close()
        }
      }
  }

  /**
   * Effectively-exactly-once JDBC sink (the §7.4 item-1 answer): Spark's
   * sinks are at-least-once under retries — the same micro-batch (epoch)
   * can be delivered twice. This wrapper records committed epochs in a
   * tracking table inside the SAME transaction as the data write, and
   * skips epochs already present on replay: duplicate delivery becomes a
   * no-op, which composes with any idempotent or append-only target.
   * (Same design as transactional sink commit protocols; the tracking
   * table needs `(query_id text, epoch_id bigint, PRIMARY KEY(query_id,
   * epoch_id))`.)
   */
  class JdbcEpochIdempotent(connect: () => Connection, queryId: String,
                            trackingTable: String = "graft_epochs")
      extends Serializable {

    /** Run `write(conn)` exactly once per epoch: returns false if the
      * epoch was already committed (replay detected). */
    def writeEpoch(epochId: Long)(write: Connection => Unit): Boolean = {
      val conn = connect()
      try {
        conn.setAutoCommit(false)
        val check = conn.prepareStatement(
          s"SELECT 1 FROM $trackingTable WHERE query_id = ? AND epoch_id = ?")
        check.setString(1, queryId)
        check.setLong(2, epochId)
        val rs = check.executeQuery()
        val seen = rs != null && rs.next()
        check.close()
        if (seen) { conn.rollback(); false }
        else {
          write(conn)
          val mark = conn.prepareStatement(
            s"INSERT INTO $trackingTable (query_id, epoch_id) VALUES (?, ?)")
          mark.setString(1, queryId)
          mark.setLong(2, epochId)
          mark.executeUpdate()
          mark.close()
          conn.commit()
          true
        }
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally conn.close()
    }

    /**
     * The flagship scale path: partitioned epoch write, no driver
     * materialization. Phase 1 — every partition streams its rows into
     * `stagingTable` over its OWN connection, first deleting its
     * (query, epoch, partition) slice so a task retry overwrites rather
     * than duplicates; each partition commits independently (staging is
     * exactly-once per slice). Phase 2 — ONE driver-side transaction
     * promotes the epoch's staging rows into the target via the
     * set-based `promoteSql` (INSERT .. SELECT, executed inside the
     * database — no row crosses the driver), records the epoch marker,
     * and clears staging, all atomically. A replayed epoch re-stages and
     * is then skipped by the marker check; its staging slice is cleaned
     * up so replays leave no residue.
     *
     * Contracts: `stagingInsertSql` parameters 1-3 are
     * (query_id, epoch_id, part_id) — `bind` binds data columns from
     * index 4; `promoteSql` parameters 1-2 are (query_id, epoch_id).
     */
    def sinkPartitioned(stagingTable: String, stagingInsertSql: String,
                        bind: (PreparedStatement, Row) => Unit,
                        promoteSql: String)
                       (batch: DataFrame, epochId: Long): Unit = {
      val qid = queryId
      val open = connect
      batch.foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conn = open()
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(s"DELETE FROM $stagingTable " +
            "WHERE query_id = ? AND epoch_id = ? AND part_id = ?")
          del.setString(1, qid); del.setLong(2, epochId); del.setInt(3, pid)
          del.executeUpdate(); del.close()
          val ps = conn.prepareStatement(stagingInsertSql)
          try it.foreach { r =>
            ps.setString(1, qid); ps.setLong(2, epochId); ps.setInt(3, pid)
            bind(ps, r); ps.executeUpdate()
          } finally ps.close()
          conn.commit()
        } catch { case e: Throwable => conn.rollback(); throw e }
        finally conn.close()
      }
      val promoted = writeEpoch(epochId) { conn =>
        val ps = conn.prepareStatement(promoteSql)
        ps.setString(1, qid); ps.setLong(2, epochId)
        ps.executeUpdate(); ps.close()
        val clean = conn.prepareStatement(
          s"DELETE FROM $stagingTable WHERE query_id = ? AND epoch_id = ?")
        clean.setString(1, qid); clean.setLong(2, epochId)
        clean.executeUpdate(); clean.close()
      }
      if (!promoted) {
        // replayed epoch: the marker txn skipped, but phase 1 re-staged —
        // clear the orphan slice (autocommit; idempotent)
        val conn = open()
        try {
          val clean = conn.prepareStatement(
            s"DELETE FROM $stagingTable WHERE query_id = ? AND epoch_id = ?")
          clean.setString(1, qid); clean.setLong(2, epochId)
          clean.executeUpdate(); clean.close()
        } finally conn.close()
      }
    }

    /** foreachBatch adapter for SMALL outputs only (dimension-table
      * refresh shape): rows are collected on the driver. Anything with
      * real volume belongs on [[sinkPartitioned]]. */
    def sink(insertSql: String, bind: (PreparedStatement, Row) => Unit)
            (batch: DataFrame, epochId: Long): Unit = {
      val rows = batch.collect()
      writeEpoch(epochId) { conn =>
        val ps = conn.prepareStatement(insertSql)
        try rows.foreach { r => bind(ps, r); ps.executeUpdate() }
        finally ps.close()
      }
    }
  }

  /** K4: declarative JDBC batch append (reference JdbcSink.sink with
    * batchSize 1000 — flinkStreamingJDBCSink02.scala:107-128). Retries are
    * Spark task retries; `batchsize` matches the reference knob. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 user: String, password: String, batchSize: Int = 1000): Unit = {
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(url, table, props)
  }

  /** K4 streaming twin: foreachBatch + append, per-micro-batch. */
  def jdbcAppendStream(df: DataFrame, url: String, table: String,
                       user: String, password: String, checkpointDir: String,
                       batchSize: Int = 1000): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        jdbcAppend(batch, url, table, user, password, batchSize)
      }
}
