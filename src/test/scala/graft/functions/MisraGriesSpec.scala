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

  test("declared verdict query: ok for every row at sf0.001") {
    val rows = graft.SparkEntry.queries("ext_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._3),
      s"verdict rows must all be ok: ${rows.mkString(", ")}")
  }
}
