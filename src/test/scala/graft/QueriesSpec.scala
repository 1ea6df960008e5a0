package graft

import graft.io.Sources.AppConfig

/** Smoke: representative declared queries run end-to-end at sf0.001 and
  * the full DuckDB hash-compare runs driver-side (scripts/local_verify.py);
  * here we pin shape + non-emptiness so refactors can't silently blank a
  * query. */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  /** Queries whose result is legitimately empty on the small fixture
    * (no embedding pair reaches cosine 0.95 in the synthetic data). */
  private val mayBeEmpty = Set("ext_embed_neardup_lsh")

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs at sf0.001" +
      (if (mayBeEmpty(name)) "" else " and returns rows")) {
      val n = SparkEntry.queries(name)(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0)
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
