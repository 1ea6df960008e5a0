package graft.ops

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.DailyPrice

/** P1 parse, F1/F2 dates, P3-P7 transforms (SURVEY §2.3/§2.4/§5). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val goodLines = Seq(
    "NYSE,ABB,2010-01-04,19.05,19.19,18.90,19.12,1720000,17.84",
    "NYSE,IBM,2010-12-31,146.73,147.07,145.96,146.76,2969800,122.30",
    "NYSE,CAT,2011-03-15,99.92,101.93,99.01,101.11,8126400,88.52",
    "NYSE,GE,2011-03-15,19.45,19.70,19.30,19.61,66834000,16.98")

  test("P1 strict parse applies the positional schema") {
    val out = Csv.parse(goodLines.toDF("value"), Csv.dailyPriceSchema).as[DailyPrice].collect()
    assert(out.length == 4)
    assert(out.head == DailyPrice("NYSE", "ABB", "2010-01-04",
      19.05f, 19.19f, 18.90f, 19.12f, 1720000, 17.84f))
  }

  test("P1 strict parse throws on malformed rows (reference cast-throw parity)") {
    val bad = (goodLines :+ "NYSE,BAD,2010-01-04,notanumber,1,1,1,1,1").toDF("value")
    val e = intercept[SparkException] {
      Csv.parse(bad, Csv.dailyPriceSchema).collect()
    }
    assert(e.getMessage.contains("Malformed") || e.getCause != null)
  }

  test("P1 permissive parse nulls malformed fields instead (100 TB mode)") {
    val bad = (goodLines :+ "NYSE,BAD,2010-01-04,notanumber,1,1,1,1,1").toDF("value")
    val out = Csv.parse(bad, Csv.dailyPriceSchema, strict = false).collect()
    assert(out.length == 5)
    assert(out.last.getAs[Any]("open") == null)
  }

  test("P1 quarantine parse splits valid rows from malformed lines") {
    val bad = (goodLines ++ Seq(
      "NYSE,BAD,2010-01-04,notanumber,1,1,1,1,1",
      "short,row")).toDF("value")
    val (valid, quarantined) = Csv.parseQuarantine(bad, Csv.dailyPriceSchema)
    assert(valid.count() == 4)
    assert(valid.as[DailyPrice].collect().map(_.symbol).toSet ==
      Set("ABB", "IBM", "CAT", "GE"))
    val q = quarantined.as[String].collect()
    assert(q.length == 2 && q.exists(_.contains("notanumber")))
  }

  test("F2: week-year variant reproduces the reference bug on Dec 28-31") {
    val df = Seq("2010-12-31", "2010-06-15").toDF("trdate")
      .select(Dates.extractYear(col("trdate")).as("correct"),
        Dates.weekYear(col("trdate")).as("buggy"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows(0) == ((2010, 2011))) // week-year rolls forward at year end
    assert(rows(1) == ((2010, 2010)))
  }

  private def prices = Csv.parse(goodLines.toDF("value"), Csv.dailyPriceSchema)

  test("P3: symbol-set filter") {
    assert(Transforms.symbolSetFilter(prices, Seq("ABB", "IBM", "CAT")).count() == 3)
  }

  test("P4: threshold filter") {
    val out = Transforms.thresholdFilter(prices, "ABB", high = 19.0, low = 5.0)
    assert(out.count() == 1)
  }

  test("P5: verbatim unparenthesized precedence (&& over ||)") {
    // Values chosen exactly float-representable (x.5/x.25): a double
    // literal equality against a float column would otherwise never match.
    val rows = Seq(
      "NYSE,ABB,2010-01-04,19.00,20.50,18.50,19.12,1720000,17.84",
      "NYSE,CAT,2011-03-15,99.92,101.93,99.25,101.11,8126400,88.52",
      "NYSE,CAT,2009-03-15,99.92,101.93,99.25,101.11,8126400,88.52",
      "NYSE,GE,2011-03-15,19.45,20.50,19.30,19.61,66834000,16.98")
      .toDF("value")
    val df = Csv.parse(rows, Csv.dailyPriceSchema)
    // (symbol∈S && high==20.5) || (low==99.25 && 2010<=yr<=2011)
    val out = Transforms.compoundFilter(df, Seq("ABB", "IBM", "CAT"),
      high = 20.5, low = 99.25, yearFrom = 2010, yearTo = 2011)
    val got = out.select("symbol", "trdate").as[(String, String)].collect().toSet
    // ABB matches the left conjunct; 2011-CAT matches the right conjunct
    // (its high fails the left); 2009-CAT fails the year range; GE's high
    // matches but GE ∉ S — together they distinguish the parse.
    assert(got == Set(("ABB", "2010-01-04"), ("CAT", "2011-03-15")))
  }

  test("P6: enrichment projection with injected clock is deterministic") {
    val out = Transforms.enrichCsvLine(prices.filter($"symbol" === "ABB"),
      "topicA", clockEpochSec = Some(42L)).as[String].collect()
    assert(out.head == "42,topicA,NYSE,ABB,2010-01-04,19.05,19.19,18.9,19.12,1720000,17.84,0.0700016")
  }

  test("P7/A1: tokenize + word count golden") {
    val lines = Seq("To be, or not to be", "that is the Question!", "be be BE")
      .toDF("value")
    val counts = Transforms.wordCount(lines)
      .as[(String, Long)].collect().toMap
    assert(counts == Map("to" -> 2L, "be" -> 5L, "or" -> 1L, "not" -> 1L,
      "that" -> 1L, "is" -> 1L, "the" -> 1L, "question" -> 1L))
  }
}
