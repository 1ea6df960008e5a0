package graft

import graft.io.Sources.AppConfig

/** Smoke: representative declared queries run end-to-end at sf0.001 and
  * the full DuckDB hash-compare runs driver-side (scripts/local_verify.py);
  * here we pin shape + non-emptiness so refactors can't silently blank a
  * query. */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val expectNonEmpty = Seq(
    "p1_csv_roundtrip", "p5_filter_compound", "a2_sum_group",
    "a3_minmax_year", "j3_join_big", "s2_window_rank",
    "e1_events_hourly", "ext_dedup_minhash_pairs", "ext_ann_brute",
    "ext_text_quality", "ext_mm_frames")

  expectNonEmpty.foreach { name =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, dir).count() > 0)
    }
  }

  test("every declared oracle has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("AppConfig precedence: args override file keys") {
    val c = AppConfig(Map("a" -> "1", "b" -> "2"))
    assert(c.get("a") == "1")
    assert(c.getOrElse("z", "dflt") == "dflt")
    intercept[IllegalArgumentException](c.get("missing"))
    val merged = AppConfig(c.props ++ AppConfig.fromArgs(Array("--a", "9")).props)
    assert(merged.get("a") == "9" && merged.get("b") == "2")
  }
}
