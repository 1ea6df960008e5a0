package graft.io

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}

import graft.SparkSpec
import graft.model.SensorReading

/**
 * K3 upsert protocol against a reflective fake JDBC driver (no database in
 * the test environment; the protocol — UPDATE accumulate, INSERT fallback —
 * is what the reference implements in flinkStreamingJDBCSink.scala:193-214).
 */
object FakeDb {
  final case class Row(ts: Long, temp: Float, iteration: Int)
  val table = new java.util.concurrent.ConcurrentHashMap[String, Row]()
  var updates = 0
  var inserts = 0

  def reset(): Unit = { table.clear(); updates = 0; inserts = 0 }

  private class StatementHandler(sql: String) extends InvocationHandler {
    private val params = scala.collection.mutable.Map[Int, Any]()
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "setString" | "setLong" | "setFloat" =>
          params(args(0).asInstanceOf[Int]) = args(1); null
        case "executeUpdate" =>
          if (sql.startsWith("UPDATE")) {
            val id = params(3).asInstanceOf[String]
            FakeDb.synchronized {
              Option(table.get(id)) match {
                case Some(r) =>
                  updates += 1
                  table.put(id, Row(params(1).asInstanceOf[Long],
                    r.temp + params(2).asInstanceOf[Float], r.iteration + 1))
                  Integer.valueOf(1)
                case None => Integer.valueOf(0)
              }
            }
          } else {
            val id = params(1).asInstanceOf[String]
            FakeDb.synchronized {
              inserts += 1
              table.put(id, Row(params(2).asInstanceOf[Long],
                params(3).asInstanceOf[Float], 1))
            }
            Integer.valueOf(1)
          }
        case "close" => null
        case _ => null
      }
  }

  private class ConnectionHandler extends InvocationHandler {
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "prepareStatement" =>
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[PreparedStatement]),
            new StatementHandler(args(0).asInstanceOf[String]))
        case "close" => null
        case "isClosed" => java.lang.Boolean.FALSE
        case _ => null
      }
  }

  def connect(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), new ConnectionHandler).asInstanceOf[Connection]
}

/** Transactional fake for the epoch-idempotent sink: tracks committed
  * epochs and appended rows, honoring select/insert/commit/rollback. */
object FakeTxDb {
  val epochs = scala.collection.mutable.Set[(String, Long)]()
  val rows = scala.collection.mutable.ArrayBuffer[String]()
  private val pendingEpochs = scala.collection.mutable.Set[(String, Long)]()
  private val pendingRows = scala.collection.mutable.ArrayBuffer[String]()

  def reset(): Unit = { epochs.clear(); rows.clear(); pendingEpochs.clear(); pendingRows.clear() }

  private class Stmt(sql: String) extends InvocationHandler {
    private val params = scala.collection.mutable.Map[Int, Any]()
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "setString" | "setLong" =>
          params(args(0).asInstanceOf[Int]) = args(1); null
        case "executeQuery" =>
          val seen = FakeTxDb.synchronized(epochs.contains(
            (params(1).asInstanceOf[String], params(2).asInstanceOf[Long])))
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[java.sql.ResultSet]), new InvocationHandler {
              private var first = true
              override def invoke(p: AnyRef, mm: Method, a: Array[AnyRef]): AnyRef =
                mm.getName match {
                  case "next" =>
                    val r = first && seen; first = false; java.lang.Boolean.valueOf(r)
                  case _ => null
                }
            })
        case "executeUpdate" =>
          FakeTxDb.synchronized {
            if (sql.contains("graft_epochs"))
              pendingEpochs += ((params(1).asInstanceOf[String],
                params(2).asInstanceOf[Long]))
            else pendingRows += params(1).asInstanceOf[String]
          }
          Integer.valueOf(1)
        case _ => null
      }
  }

  private class Conn extends InvocationHandler {
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "prepareStatement" =>
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[PreparedStatement]),
            new Stmt(args(0).asInstanceOf[String]))
        case "commit" =>
          FakeTxDb.synchronized {
            epochs ++= pendingEpochs; rows ++= pendingRows
            pendingEpochs.clear(); pendingRows.clear()
          }
          null
        case "rollback" =>
          FakeTxDb.synchronized { pendingEpochs.clear(); pendingRows.clear() }
          null
        case _ => null
      }
  }

  def connect(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), new Conn).asInstanceOf[Connection]
}

/** Transactional fake with a staging table and PER-CONNECTION pending
  * state, so concurrent partition transactions don't interleave (the
  * partitioned epoch sink commits one transaction per partition in
  * parallel). Autocommit connections apply statements immediately. */
object FakeStagingDb {
  val epochs = scala.collection.mutable.Set[(String, Long)]()
  val staging = scala.collection.mutable.ArrayBuffer[(String, Long, Int, String)]()
  val target = scala.collection.mutable.ArrayBuffer[String]()
  var stagingDeletes = 0

  def reset(): Unit = this.synchronized {
    epochs.clear(); staging.clear(); target.clear(); stagingDeletes = 0
  }

  private class Stmt(sql: String, conn: Conn) extends InvocationHandler {
    private val params = scala.collection.mutable.Map[Int, Any]()
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "setString" | "setLong" | "setInt" =>
          params(args(0).asInstanceOf[Int]) = args(1); null
        case "executeQuery" => // epoch marker check
          val seen = FakeStagingDb.synchronized(epochs.contains(
            (params(1).asInstanceOf[String], params(2).asInstanceOf[Long])))
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[java.sql.ResultSet]), new InvocationHandler {
              private var first = true
              override def invoke(p: AnyRef, mm: Method, a: Array[AnyRef]): AnyRef =
                mm.getName match {
                  case "next" =>
                    val r = first && seen; first = false
                    java.lang.Boolean.valueOf(r)
                  case _ => null
                }
            })
        case "executeUpdate" =>
          val p = params.toMap
          val op: () => Unit =
            if (sql.startsWith("INSERT INTO staging")) { () =>
              staging += ((p(1).asInstanceOf[String], p(2).asInstanceOf[Long],
                p(3).asInstanceOf[Int], p(4).asInstanceOf[String]))
            } else if (sql.startsWith("DELETE FROM staging") && sql.contains("part_id")) { () =>
              stagingDeletes += 1
              val k = (p(1).asInstanceOf[String], p(2).asInstanceOf[Long],
                p(3).asInstanceOf[Int])
              staging.filterInPlace(s => (s._1, s._2, s._3) != k)
            } else if (sql.startsWith("DELETE FROM staging")) { () =>
              val k = (p(1).asInstanceOf[String], p(2).asInstanceOf[Long])
              staging.filterInPlace(s => (s._1, s._2) != k)
            } else if (sql.contains("graft_epochs")) { () =>
              epochs += ((p(1).asInstanceOf[String], p(2).asInstanceOf[Long]))
            } else { () => // promote: INSERT INTO target SELECT .. FROM staging
              val k = (p(1).asInstanceOf[String], p(2).asInstanceOf[Long])
              target ++= staging.filter(s => (s._1, s._2) == k).map(_._4)
            }
          conn.enqueue(op)
          Integer.valueOf(1)
        case _ => null
      }
  }

  private class Conn extends InvocationHandler {
    private var autoCommit = true
    private val pending = scala.collection.mutable.ArrayBuffer[() => Unit]()
    def enqueue(op: () => Unit): Unit =
      if (autoCommit) FakeStagingDb.synchronized(op())
      else pending += op
    override def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
      m.getName match {
        case "setAutoCommit" =>
          autoCommit = args(0).asInstanceOf[java.lang.Boolean]; null
        case "prepareStatement" =>
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[PreparedStatement]),
            new Stmt(args(0).asInstanceOf[String], this))
        case "commit" =>
          FakeStagingDb.synchronized { pending.foreach(_()); pending.clear() }
          null
        case "rollback" => pending.clear(); null
        case _ => null
      }
  }

  def connect(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), new Conn).asInstanceOf[Connection]
}

class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val readings = Seq(
    SensorReading("sensor_1", 1547718199L, 35.8f),
    SensorReading("sensor_6", 1547718201L, 15.4f),
    SensorReading("sensor_1", 1547718207L, 36.3f),
    SensorReading("sensor_3", 1547718208L, -12.5f))

  test("upsert protocol: INSERT first occurrence, accumulate on UPDATE") {
    FakeDb.reset()
    val sink = new Sinks.JdbcUpsert(() => FakeDb.connect(), "t_test")
    // single partition: deterministic per-key ordering like parallelism-1
    sink.writeBatch(readings.toDS().repartition(1))
    assert(FakeDb.inserts == 3 && FakeDb.updates == 1)
    val s1 = FakeDb.table.get("sensor_1")
    assert(s1.iteration == 2)
    assert(math.abs(s1.temp - (35.8f + 36.3f)) < 1e-5)
    assert(FakeDb.table.get("sensor_3").temp == -12.5f)
  }

  test("replaying the batch keeps accumulating (reference semantics)") {
    FakeDb.reset()
    val sink = new Sinks.JdbcUpsert(() => FakeDb.connect(), "t_test")
    sink.writeBatch(readings.toDS().repartition(1))
    sink.writeBatch(readings.toDS().repartition(1))
    assert(FakeDb.table.get("sensor_1").iteration == 4)
    assert(FakeDb.table.get("sensor_6").iteration == 2)
  }

  test("ForeachWriter lifecycle runs the same protocol") {
    FakeDb.reset()
    val w = new Sinks.JdbcUpsert(() => FakeDb.connect(), "t_test").foreachWriter
    assert(w.open(0L, 0L))
    readings.foreach(w.process)
    w.close(null)
    assert(FakeDb.table.get("sensor_1").iteration == 2)
  }

  test("epoch-idempotent sink writes each epoch once, replays are no-ops") {
    FakeTxDb.reset()
    val sink = new Sinks.JdbcEpochIdempotent(() => FakeTxDb.connect(), "q1")
    val df = Seq("r1", "r2").toDF("v")
    val write = sink.sink("INSERT INTO t (v) VALUES (?)",
      (ps, r) => ps.setString(1, r.getString(0))) _
    write(df, 0L)
    write(df, 0L) // replayed epoch → skipped
    write(df, 1L)
    assert(FakeTxDb.rows.size == 4) // 2 rows × 2 distinct epochs
    assert(FakeTxDb.epochs == Set(("q1", 0L), ("q1", 1L)))
  }

  test("partitioned epoch sink: staged per-partition, promoted once, replay residue-free") {
    FakeStagingDb.reset()
    val sink = new Sinks.JdbcEpochIdempotent(() => FakeStagingDb.connect(), "qp")
    val df = Seq("r1", "r2", "r3", "r4").toDF("v").repartition(2)
    val write = sink.sinkPartitioned(
      "staging",
      "INSERT INTO staging (query_id, epoch_id, part_id, v) VALUES (?, ?, ?, ?)",
      (ps, r) => ps.setString(4, r.getString(0)),
      "INSERT INTO target (v) SELECT v FROM staging WHERE query_id = ? AND epoch_id = ?") _

    write(df, 0L)
    assert(FakeStagingDb.target.sorted == Seq("r1", "r2", "r3", "r4"))
    assert(FakeStagingDb.staging.isEmpty)              // promoted + cleaned
    assert(FakeStagingDb.epochs == Set(("qp", 0L)))
    assert(FakeStagingDb.stagingDeletes >= 2)          // delete-before-insert per slice

    write(df, 0L)                                      // full epoch replay
    assert(FakeStagingDb.target.size == 4)             // no double-promote
    assert(FakeStagingDb.staging.isEmpty)              // replay slice cleaned up

    write(df, 1L)
    assert(FakeStagingDb.target.size == 8)
    assert(FakeStagingDb.epochs == Set(("qp", 0L), ("qp", 1L)))
  }

  test("UpsertSql renders the reference statements") {
    val sql = Sinks.UpsertSql("db.t")
    assert(sql.update ==
      "UPDATE db.t SET sensor_ts = ?, sensor_temp = sensor_temp + ?, iteration = iteration + 1 WHERE sensor_id = ?")
    assert(sql.insert ==
      "INSERT INTO db.t (sensor_id, sensor_ts, sensor_temp, iteration) VALUES (?, ?, ?, 1)")
  }
}
