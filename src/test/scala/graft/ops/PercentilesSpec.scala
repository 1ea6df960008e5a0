package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-percentile semantics: known interpolated values, and the
  * two-level bucketed variant must equal the plain per-group window on
  * every edge (tiny groups, bucket borders between the bracketing ranks,
  * single-element groups). */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("linear interpolation matches the closed form on a known group") {
    // values 10,20,30,40: p50 → h=1.5 → 20*(0.5)+30*(0.5)=25
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0))
      .toDF("k", "v")
    val r = Percentiles.exactPercentiles(df, Seq("k"), "v", Seq(0.5, 0.25))
      .collect().head
    assert(r.getAs[Double]("p50") == 25.0)
    assert(r.getAs[Double]("p25") == 17.5) // h=0.75 → 10*0.25+20*0.75
  }

  test("bucketed variant equals the plain variant on edge-shaped groups") {
    // group x: 1 element; group y: duplicates + values straddling bucket
    // borders (bucket width 10 cuts 9.9→0 and 10.1→1, which are the
    // bracketing ranks of several percentiles); group z: uniform spread
    val df = (Seq(("x", 42.0)) ++
      Seq(9.9, 10.1, 10.1, 19.9, 20.0, 20.1, 35.0).map(("y", _)) ++
      (1 to 100).map(i => ("z", i.toDouble))).toDF("k", "v")
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val plain = Percentiles.exactPercentiles(df, Seq("k"), "v", ps)
    val bucketed = Percentiles.exactPercentilesBucketed(df, Seq("k"), "v", ps)(
      v => floor(v / 10).cast("long"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("bucketed variant equals the plain variant on lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ps = Seq(0.25, 0.5, 0.75)
    val plain = Percentiles.exactPercentiles(
      li, Seq("l_returnflag"), "l_extendedprice", ps)
    val bucketed = Percentiles.exactPercentilesBucketed(
      li, Seq("l_returnflag"), "l_extendedprice", ps)(
      v => floor(v / 2000).cast("long"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }
}
