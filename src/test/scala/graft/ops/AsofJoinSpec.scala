package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq( // (sym, t, px, note)
    ("A", 10L, 1.0, "a1"), ("A", 20L, 2.0, "a2"), ("A", 20L, 9.0, "a2b"),
    ("B", 15L, 5.0, "b1"))
    .toDF("sym", "qt", "px", "note")

  private val trades = Seq( // (sym, t, id)
    ("A", 5L, 1L),   // before any quote → null match
    ("A", 10L, 2L),  // equal time → matches the t=10 quote (<= semantics)
    ("A", 25L, 3L),  // after both → latest (t=20), tie broken by highest ord
    ("B", 15L, 4L),
    ("C", 99L, 5L))  // key with no quotes at all
    .toDF("sym", "tt", "id")

  test("as-of join attaches the latest right row at or before left time") {
    val out = AsofJoin.asofJoin(trades, quotes, key = "sym",
      leftTime = col("tt"), rightTime = col("qt"),
      rightCols = Seq("px", "note"), rightOrd = col("px"))
      .select("id", "px", "note").as[(Long, Option[Double], Option[String])]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, None, None)))
    assert(out(1) == ((2L, Some(1.0), Some("a1"))))
    assert(out(2) == ((3L, Some(9.0), Some("a2b")))) // tie at t=20 → max ord
    assert(out(3) == ((4L, Some(5.0), Some("b1"))))  // equal time included
    assert(out(4) == ((5L, None, None)))
  }

  test("salted variant equals the unsalted join (synthetic edge cases)") {
    // buckets of width 10 cut right between events: carry-in must cross
    // bucket borders, left-only buckets must still see earlier quotes
    val plain = AsofJoin.asofJoin(trades, quotes, "sym",
      col("tt"), col("qt"), Seq("px", "note"), rightOrd = col("px"))
    val salted = AsofJoin.asofJoinSalted(trades, quotes, "sym",
      col("tt"), col("qt"), Seq("px", "note"), rightOrd = col("px"))(
      t => floor(t / 10).cast("long"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted variant equals the unsalted join on the events table") {
    // the e3 query shape: page_view events as-of-joined to purchase events
    val ev = graft.Queries.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"),
        expr("ts DIV 1000000000").as("sec"), col("value"))
    val l = ev.filter(col("event_type") === "page_view")
      .select(col("user_id"), col("sec").as("lsec"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec").as("rsec"), col("value"))
    val plain = AsofJoin.asofJoin(l, r, "user_id",
      col("lsec"), col("rsec"), Seq("rsec", "value"), rightOrd = col("rsec"))
    val salted = AsofJoin.asofJoinSalted(l, r, "user_id",
      col("lsec"), col("rsec"), Seq("rsec", "value"), rightOrd = col("rsec"))(
      t => floor(t / 86400).cast("long")) // daily buckets
    assert(plain.count() == salted.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("right row carried atomically (no cross-row column mixing)") {
    // latest quote has a null note; a per-column carry would back-fill it
    val q = Seq(("A", 10L, 1.0, Some("early")), ("A", 20L, 2.0, None))
      .toDF("sym", "qt", "px", "note")
    val tr = Seq(("A", 30L, 1L)).toDF("sym", "tt", "id")
    val out = AsofJoin.asofJoin(tr, q, "sym", col("tt"), col("qt"),
      Seq("px", "note"), rightOrd = col("px"))
      .select("px", "note").as[(Double, Option[String])].head()
    assert(out == ((2.0, None))) // the t=20 row as-is, note stays null
  }
}
