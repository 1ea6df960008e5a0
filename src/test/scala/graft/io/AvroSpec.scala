package graft.io

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-trips the reference's (corrected) NYSE Avro schema through the
  * Avro-core codec — closes the declared flink-avro capability. */
class AvroSpec extends SparkSpec {

  private val nyseRows = Seq(
    Row("NYSE", "IBM", "2010-02-03", 122.9f, 123.5f, 122.2f, 124.0f, 5605300, 123.5f),
    Row("NYSE", "GE", "2010-02-03", 16.1f, 16.4f, 16.0f, 16.5f, 74792100, 16.4f),
    Row("NASD", "AAPL", "2010-02-04", 195.2f, 192.1f, 191.3f, 196.0f, 26927000, 192.1f))

  private def nyseDf = spark.createDataFrame(
    spark.sparkContext.parallelize(nyseRows, 2),
    Avro.sparkSchema(Avro.NyseSchemaJson))

  test("sparkSchema maps the NYSE record to the expected struct") {
    val s = Avro.sparkSchema(Avro.NyseSchemaJson)
    assert(s.fieldNames.toSeq == Seq("xchange", "symbol", "trdate", "open",
      "close", "low", "high", "volume", "adj_close"))
    assert(s("volume").dataType == IntegerType)
    assert(s("open").dataType == FloatType)
    assert(s("symbol").dataType == StringType)
  }

  test("NYSE rows round-trip through Avro binary unchanged") {
    val df = nyseDf
    val bytes = Avro.toAvroBytes(df, Avro.NyseSchemaJson)
    assert(bytes.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("value", BinaryType)))
    val back = Avro.fromAvroBytes(bytes, Avro.NyseSchemaJson)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("column order is free on encode (fields bound by name)") {
    val shuffled = nyseDf.select("volume", "symbol", "xchange", "trdate",
      "open", "close", "low", "high", "adj_close")
    val back = Avro.fromAvroBytes(
      Avro.toAvroBytes(shuffled, Avro.NyseSchemaJson), Avro.NyseSchemaJson)
    assert(back.exceptAll(nyseDf).isEmpty)
  }

  test("extreme float values survive the round-trip (NaN, infinities, denormals)") {
    val extremes = Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
      Float.MinValue, Float.MaxValue, Float.MinPositiveValue, -0.0f, 0.0f)
    val rows = extremes.zipWithIndex.map { case (f, i) =>
      Row("X", s"S$i", "2020-01-01", f, f, f, f, i, f)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      Avro.sparkSchema(Avro.NyseSchemaJson))
    val back = Avro.fromAvroBytes(
      Avro.toAvroBytes(df, Avro.NyseSchemaJson), Avro.NyseSchemaJson)
    // exceptAll uses NaN-safe equality, so NaN rows compare equal
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("round-trip works on real table data (orders projected to a flat record)") {
    val schema =
      """{"name": "Ord", "type": "record", "fields": [
        |  {"name": "o_orderkey", "type": "long"},
        |  {"name": "o_orderstatus", "type": "string"},
        |  {"name": "o_totalprice", "type": "double"}]}""".stripMargin
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val back = Avro.fromAvroBytes(Avro.toAvroBytes(df, schema), schema)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
