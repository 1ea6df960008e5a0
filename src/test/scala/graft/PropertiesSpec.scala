package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{GraftFunctions, TopKBuffer}
import graft.model.DailyPrice
import graft.ops.Csv

/** Property-based checks (SURVEY §5 item 4): CSV round-trip, kernel ≡
  * column-algebra tokenization, and top-k heap ≡ sort-take-k under
  * arbitrary inputs and merge splits. Deterministic seeded sampling (the
  * scalatest-scalacheck bridge is not on the offline classpath). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Draw `n` deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A], n: Int = 20)(check: A => Unit): Unit = {
    val drawn = samples(g, n)
    assert(drawn.size >= n / 2, "generator produced too few samples")
    drawn.foreach(check)
  }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(check: (A, B) => Unit): Unit =
    samples(Gen.zip(ga, gb), n).foreach { case (a, b) => check(a, b) }

  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int)(
      check: (A, B, C) => Unit): Unit =
    samples(Gen.zip(ga, gb, gc), n).foreach { case (a, b, c) => check(a, b, c) }

  private val plainStr = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
  private val genPrice = for {
    x <- plainStr; s <- plainStr; d <- Gen.choose(1, 28)
    o <- Gen.choose(1f, 500f); h <- Gen.choose(1f, 500f)
    l <- Gen.choose(1f, 500f); c <- Gen.choose(1f, 500f)
    v <- Gen.choose(0, Int.MaxValue); a <- Gen.choose(1f, 500f)
  } yield DailyPrice(x, s, f"2020-01-$d%02d", o, h, l, c, v, a)

  test("property: CSV format → parse round-trips DailyPrice exactly") {
    forAll(Gen.listOfN(20, genPrice), n = 5) { rows =>
      val lines = rows.toDS().select(Csv.format(
        Csv.dailyPriceSchema.fieldNames.map(col).toSeq).as("value"))
      val back = Csv.parse(lines, Csv.dailyPriceSchema)
        .as[DailyPrice].collect().toSeq
      assert(back == rows)
    }
  }

  test("property: tokens_lc kernel ≡ lower+split+filter for arbitrary strings") {
    val genText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", "\n", "!", "#", "_", "é", "日", "::", "--")))
      .map(_.mkString)
    forAll(Gen.listOfN(30, genText), n = 5) { texts =>
      val mismatches = texts.toDF("text").select(
        GraftFunctions.tokens_lc(col("text")).as("k"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "").as("a"))
        .filter(not(col("k") === col("a"))).count()
      assert(mismatches == 0)
    }
  }

  test("property: top-k heap ≡ sort-take-k under arbitrary merge splits") {
    val genEntries = Gen.listOf(
      Gen.zip(Gen.choose(0.0, 10.0), Gen.choose(0L, 50L)))
    forAll3(genEntries, Gen.choose(1, 8), Gen.choose(1, 5), n = 50) { (entries, k, nSplits) =>
      // distinct: duplicate (score,id) pairs are kept once by the expected
      // model but twice by the heap — feed distinct entries only
      val uniq = entries.distinct
      val expected = uniq
        .sortBy { case (s, id) => (-s, id) }.take(k)
      val parts = uniq.grouped(math.max(1, uniq.size / nSplits + 1)).toList
      val bufs = parts.map { part =>
        val b = new TopKBuffer(k)
        part.foreach { case (s, id) => b.insert(s, id) }
        b
      }
      val merged = bufs.reduceOption { (a, b) =>
        (0 until b.size).foreach(i => a.insert(b.scores(i), b.ids(i)))
        a
      }.getOrElse(new TopKBuffer(k))
      assert(merged.sortedDesc.toSeq == expected)
    }
  }

  test("property: upsert protocol is accumulate-idempotent in structure") {
    // replaying n copies of a batch multiplies iteration counts by n and
    // temp sums by n — the reference's accumulate semantics under replay
    forAll2(Gen.listOfN(10, Gen.zip(plainStr, Gen.choose(-50f, 50f))),
      Gen.choose(1, 3), n = 5) { (readings, n) =>
      graft.io.FakeDb.reset()
      val sink = new graft.io.Sinks.JdbcUpsert(() => graft.io.FakeDb.connect(), "t")
      val ds = readings.zipWithIndex
        .map { case ((id, temp), i) => graft.model.SensorReading(id, i.toLong, temp) }
        .toDS().repartition(1)
      (1 to n).foreach(_ => sink.writeBatch(ds))
      val byId = readings.groupBy(_._1)
      byId.foreach { case (id, rs) =>
        val row = graft.io.FakeDb.table.get(id)
        assert(row.iteration == rs.size * n)
        assert(math.abs(row.temp - rs.map(_._2).sum * n) < 1e-3 * rs.size * n + 1e-4)
      }
    }
  }
}
