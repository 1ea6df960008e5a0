package graft.model

/**
 * Entity case classes re-expressing the reference's data model
 * (reference: src/main/scala/com/bigdatalabs/flinkapps/entities/model.scala:5-42)
 * as Spark `Dataset[T]` element types. Encoders come from
 * `spark.implicits._` / `Encoders.product`.
 *
 * Fidelity notes (SURVEY.md §1.2/§7.4):
 *  - `trdate` stays a String ("yyyy-MM-dd") at ingest; DATE is derived in
 *    queries via `to_date`, matching the reference's CAST-in-SQL behavior.
 *  - money fields stay Float for parity with the reference's Float columns.
 */
final case class DailyPrice(
    xchange: String,
    symbol: String,
    trdate: String, // "yyyy-MM-dd", kept as string like the reference
    open: Float,
    high: Float,
    low: Float,
    close: Float,
    volume: Int,
    adj_close: Float)

/** reference: entities/model.scala:38-42; sensorTStamp is epoch seconds. */
final case class SensorReading(
    sensorId: String,
    sensorTStamp: Long,
    sensorTemp: Float)

/** reference: entities/model.scala:16-23 (declared there, never consumed). */
final case class AtmLog(
    tran_id: String,
    tran_dt: String,
    area: String,
    latitude: Float,
    longitude: Float,
    tran_typ: String,
    tran_amt: Float)

/** reference: entities/model.scala:25-29 (declared there, never consumed). */
final case class Student(stuid: Int, stuname: String, stuaddr: String, stusex: String)

/** reference: flinkTableJDBC02.scala:59-64 (local Book class). */
final case class Book(bookId: Long, bookTitle: String, bookAuthor: String, bookYear: Int)

/** reference: flinkStreamTable.scala:61-65 (ad-hoc Row("Alice", 12)). */
final case class NameScore(name: String, score: Int)
