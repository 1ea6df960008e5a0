package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Misra–Gries heavy-hitters aggregate: its three guarantees
  * (underestimate, n/(k+1) bound, heavy-item presence) must hold under
  * EVERY partitioning — that merge-order independence is what lets the
  * declared query turn the sketch into a hash-stable verdict. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish crafted stream: item i (of 40) appears ~ N/(i+1) times —
  // real skew, vocabulary larger than k, deterministic.
  private def zipf: Seq[String] =
    (0 until 40).flatMap(i => Seq.fill(2000 / (i + 1))(s"w$i"))

  private def run(items: Seq[String], k: Int, parts: Int)
      : (Map[String, Long], Map[String, Long], Long) = {
    val df = items.toDF("word").repartition(parts)
    val est = df.agg(MisraGriesHH.heavy_hitters(col("word"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.word"), col("e.est"))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (est, exact, items.size.toLong)
  }

  test("guarantees hold at every partitioning: underestimates, n/(k+1) " +
    "bound, and every true heavy hitter present") {
    val k = 8
    for (parts <- Seq(1, 3, 7, 16)) {
      val (est, exact, n) = run(zipf, k, parts)
      assert(est.size <= k, s"parts=$parts: more than k counters")
      est.foreach { case (w, e) =>
        assert(e <= exact(w), s"parts=$parts: $w overestimated: $e > ${exact(w)}")
        assert((exact(w) - e) * (k + 1) <= n,
          s"parts=$parts: $w outside bound: est $e vs ${exact(w)}, n=$n")
      }
      exact.foreach { case (w, c) =>
        if (c * (k + 1) > n)
          assert(est.contains(w),
            s"parts=$parts: true heavy hitter $w (cnt $c, n $n) missing")
        else if (!est.contains(w))
          assert(c * (k + 1) <= n) // absent ⇒ not heavy (contrapositive)
      }
    }
  }

  test("exact when the vocabulary fits in k counters") {
    val items = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    for (parts <- Seq(1, 4)) {
      val (est, exact, _) = run(items, k = 8, parts)
      assert(est == exact, s"parts=$parts: ndv<=k must be exact")
    }
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("word")
    val est = df.agg(MisraGriesHH.heavy_hitters(col("word"), 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.word"), col("e.est"))
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }

  test("grouped aggregation: guarantees hold independently PER GROUP " +
    "(each group has its own k counters and its own n)") {
    val k = 4
    // two groups with different skews and sizes
    val items = (0 until 10).flatMap(i =>
        Seq.fill(200 / (i + 1))(("g1", s"w$i"))) ++
      (0 until 20).flatMap(i => Seq.fill(30)(("g2", s"u$i")))
    val df = items.toDF("g", "word").repartition(5)
    val est = df.groupBy("g")
      .agg(MisraGriesHH.heavy_hitters(col("word"), k).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.word"), col("e.est"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (g <- Seq("g1", "g2")) {
      val n = items.count(_._1 == g).toLong
      val e = est.getOrElse(g, Map.empty)
      assert(e.size <= k)
      e.foreach { case (w, v) =>
        assert(v <= exact((g, w)) && (exact((g, w)) - v) * (k + 1) <= n,
          s"$g/$w: est $v vs ${exact((g, w))}, n=$n")
      }
      exact.collect { case ((`g`, w), c) if c * (k + 1) > n =>
        assert(e.contains(w), s"heavy $g/$w (cnt $c, n $n) missing")
      }
    }
  }

  test("declared grouped verdict query: ok for every row at sf0.001") {
    val rows = graft.SparkEntry.queries("ext_heavy_hitters_grouped")(
      spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._4),
      s"grouped verdict rows must all be ok: ${rows.mkString(", ")}")
  }

  test("declared verdict query: ok for every row at sf0.001") {
    val rows = graft.SparkEntry.queries("ext_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._3),
      s"verdict rows must all be ok: ${rows.mkString(", ")}")
  }
}
