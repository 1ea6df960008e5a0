package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Skew salting and bucketed co-located joins. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result and spreads the hot key") {
    // 10k rows of one hot key + a long tail
    val big = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "rowid")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 1.5) }.toDF("key", "weight")

    val plain = big.join(small, "key").select("key", "rowid", "weight")
    val salted = Joins.saltedJoin(big, small, "key", 8, col("rowid"))
      .select("key", "rowid", "weight")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)

    // the hot key's rows actually land in multiple salt partitions
    val spread = big.filter($"key" === "hot")
      .select(pmod(xxhash64($"rowid"), lit(8)).as("salt"))
      .distinct().count()
    assert(spread == 8)
  }

  test("salted two-phase aggregation equals the direct aggregation") {
    val df = ((1 to 5000).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))).toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("v").as("v_sum"))
    val salted = Joins.saltedCountSum(df, Seq("key"), "v", col("v"), 16)
    // integer-valued doubles sum exactly in both orders at this scale
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
  }

  test("day-partitioned layout prunes non-matching partitions at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = Seq(
      ("2024-01-01 10:00:00", 1.0), ("2024-01-01 11:00:00", 2.0),
      ("2024-01-02 10:00:00", 3.0), ("2024-01-03 10:00:00", 4.0))
      .toDF("ts_s", "v").withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    Tables.writeDayPartitioned(df, s"$tmp/events", "ts")

    val q = spark.read.parquet(s"$tmp/events")
      .filter($"event_date" === "2024-01-01")
    assert(q.count() == 2)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-01"),
      s"expected directory-level pruning:\n$scan")
    // the pruned scan must not carry a post-scan data filter on event_date
    assert(!scan.contains("PushedFilters: [IsNotNull(v)"))
  }

  test("compaction rewrites a many-small-files directory to the byte-targeted count") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // 64 tiny files
    spark.range(10000).toDF("id").repartition(64).write.parquet(s"$tmp/small")
    val before = new java.io.File(s"$tmp/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 64)

    val totalBytes = new java.io.File(s"$tmp/small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target ~ half the data per file → expect 2 output files
    val n = Tables.compact(spark, s"$tmp/small", s"$tmp/compacted",
      targetFileBytes = totalBytes / 2 + 1)
    assert(n == 2)
    val after = new java.io.File(s"$tmp/compacted").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after == 2)
    // lossless
    val a = spark.read.parquet(s"$tmp/small")
    val b = spark.read.parquet(s"$tmp/compacted")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("range-sorted layout yields disjoint per-file key ranges (file skipping)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    val df = spark.range(10000).toDF("k")
      .withColumn("v", $"k" * 7 % 1000)
      .orderBy(rand(42)) // scrambled input
    Tables.writeSortedBy(df, s"$tmp/sorted", numFiles = 4, "k")

    val back = spark.read.parquet(s"$tmp/sorted")
    assert(back.count() == 10000)
    // per-file (min, max) of the sort key must not overlap across files —
    // that disjointness is what makes parquet min/max stats skip files
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("lo")
      .as[(String, Long, Long)].collect()
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2, ranges.mkString(","))
      case _ =>
    }
  }

  test("z-ordered layout bounds per-file ranges on BOTH columns — a " +
    "single-column sort cannot") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // two independent uniform keys: sorted-by-a gives each file the FULL
    // b range; z-order gives every file a small rectangle of (a, b)
    val df = spark.range(20000).toDF("i")
      .withColumn("a", xxhash64($"i") % 100000)
      .withColumn("b", xxhash64($"i" + 7) % 100000)
      .select("a", "b")
    Tables.writeSortedBy(df, s"$tmp/by_a", numFiles = 16, "a")
    Tables.writeZOrdered(df, s"$tmp/z", numFiles = 16, "a", "b")

    // Z-order conserves TOTAL bounding area (a k-file Morton grid and a
    // k-file single-column sort tile the same plane); its value is that
    // every file is narrow on BOTH columns, so a predicate on EITHER
    // column skips most files. Measure per-file extents: median is robust
    // to the few files that straddle Morton cell boundaries.
    def medianRanges(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).cast("double").as("ra"),
          (max("b") - min("b")).cast("double").as("rb"))
      (r.stat.approxQuantile("ra", Array(0.5), 0.0).head,
        r.stat.approxQuantile("rb", Array(0.5), 0.0).head)
    }
    val span = 200000.0 // keys are ~uniform in [-1e5, 1e5]
    val (za, zb) = medianRanges(s"$tmp/z")
    val (_, sb) = medianRanges(s"$tmp/by_a")
    // single-column sort: every file spans ~the full b range
    assert(sb > 0.8 * span, s"sorted-by-a median b-range $sb")
    // z-order: the typical file is narrow on BOTH columns. The bound is
    // 0.5·span, not the 4×4-grid ideal of 0.25: repartitionByRange's
    // boundary sampling is seeded from the RDD id, which shifts with
    // suite composition, so per-file rectangles flutter a few percent
    // run to run (a 0.4 bound flaked at 0.404 when an unrelated suite
    // was added). 0.5 still cleanly separates "narrow on both" from the
    // single-sort 0.8+ contrast above.
    assert(za < 0.5 * span, s"z median a-range $za")
    assert(zb < 0.5 * span, s"z median b-range $zb")
    // lossless
    val back = spark.read.parquet(s"$tmp/z")
    assert(back.count() == 20000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("z-order degrades gracefully on degenerate inputs: a constant " +
    "column falls back to the other column's order") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zconst").toString
    val df = spark.range(4000).toDF("b").withColumn("a", lit(42L))
      .orderBy(rand(7)).select("a", "b")
    Tables.writeZOrdered(df, s"$tmp/z", numFiles = 4, "a", "b")
    val back = spark.read.parquet(s"$tmp/z")
    assert(back.count() == 4000)
    // constant a contributes zero z-bits, so files are disjoint in b —
    // exactly what writeSortedBy(b) would give
    val ranges = back.groupBy(input_file_name())
      .agg(min("b").as("lo"), max("b").as("hi"))
      .orderBy("lo").as[(String, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2, ranges.mkString(","))
      case _ =>
    }
  }

  test("same-bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.writeBucketed(
        (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "o_val"), "t_orders_b", "k", 4)
      Tables.writeBucketed(
        (1L to 3000L).map(i => (i % 1000 + 1, s"l$i")).toDF("k", "l_val"), "t_lines_b", "k", 4)
      val joined = Tables.bucketedJoin(spark, "t_orders_b", "t_lines_b", "k")
      assert(joined.count() == 3000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_orders_b")
      spark.sql("DROP TABLE IF EXISTS t_lines_b")
    }
  }
}
