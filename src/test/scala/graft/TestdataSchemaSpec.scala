package graft

import org.apache.spark.sql.types._

/** Pins the column types of the driver's 10 input parquets (footer reads
  * only — no data scan). The driver regenerates `/root/testdata` between
  * rounds and has already changed a physical type once (round 6:
  * `events.ts` went from nanosecond INT64 to microsecond TIMESTAMP, which
  * silently broke five queries at analysis time). This suite turns any
  * future drift into ONE failing test with an actionable message instead
  * of a scatter of analysis exceptions deep inside the query surface.
  *
  * `events.ts` accepts all representations the schema-adaptive reader
  * ([[Queries.events]]) normalizes: ns-long, µs timestamp (NTZ or LTZ).
  */
class TestdataSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // expected Spark-side type per column, per table (order-insensitive:
  // extra columns are tolerated — new upstream columns are additive and
  // harmless; missing or retyped columns are not)
  private val expected: Map[String, Map[String, Set[DataType]]] = {
    def one(pairs: (String, DataType)*) =
      pairs.map { case (n, t) => n -> Set(t) }.toMap
    Map(
      "region" -> one("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> one("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> one("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> one("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> one("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> (one("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderpriority" -> StringType) +
        ("o_orderdate" -> Set[DataType](TimestampNTZType, TimestampType, DateType))),
      "lineitem" -> (one("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType) +
        ("l_shipdate" -> Set[DataType](TimestampNTZType, TimestampType, DateType))),
      "events" -> (one("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType) +
        // every representation Queries.events normalizes to ns-longs
        ("ts" -> Set[DataType](LongType, TimestampNTZType, TimestampType))),
      "documents" -> one("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> one("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
    )
  }

  test("testdata schemas match what the query surface assumes") {
    // nanosAsLong first so a ns-INT64 events file loads (matches the
    // reader's own setting); footer-only — .schema triggers no data scan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      if (!new java.io.File(path).exists)
        Seq(s"$table: file missing at $path")
      else {
        val actual = spark.read.parquet(path).schema
          .map(f => f.name -> f.dataType).toMap
        cols.toSeq.sortBy(_._1).flatMap { case (col, accepted) =>
          actual.get(col) match {
            case None =>
              Seq(s"$table.$col: column MISSING (have: ${actual.keys.toSeq.sorted.mkString(", ")})")
            case Some(t) if !accepted.exists(a => sameShape(a, t)) =>
              Seq(s"$table.$col: type changed to $t (query surface assumes one of ${accepted.mkString("/")})")
            case _ => Nil
          }
        }
      }
    }
    assert(problems.isEmpty,
      "TESTDATA SCHEMA CHANGED — the driver regenerated /root/testdata with " +
      "incompatible types. Fix the affected reader in Queries.scala (see " +
      "Queries.events for the adaptive-reader pattern) or extend the " +
      "accepted set here if the reader already normalizes it:\n  " +
      problems.mkString("\n  "))
  }

  /** ArrayType equality ignoring containsNull (writer-dependent, harmless). */
  private def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: ArrayType, y: ArrayType) => sameShape(x.elementType, y.elementType)
    case _ => a == b
  }
}
