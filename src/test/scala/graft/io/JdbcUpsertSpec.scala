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

  test("UpsertSql renders the reference statements") {
    val sql = Sinks.UpsertSql("db.t")
    assert(sql.update ==
      "UPDATE db.t SET sensor_ts = ?, sensor_temp = sensor_temp + ?, iteration = iteration + 1 WHERE sensor_id = ?")
    assert(sql.insert ==
      "INSERT INTO db.t (sensor_id, sensor_ts, sensor_temp, iteration) VALUES (?, ?, ?, 1)")
  }
}
