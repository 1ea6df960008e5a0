package graft

import graft.io.Sources.AppConfig

/** Smoke: representative declared queries run end-to-end at sf0.001 and
  * the full DuckDB hash-compare runs driver-side (scripts/local_verify.py);
  * here we pin shape + non-emptiness so refactors can't silently blank a
  * query. */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs at sf0.001 and returns rows") {
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n > 0)
    }
  }

  test("m33_sql_routed is IDEMPOTENT across invocations (the bench " +
    "median's contract: every pass converges to the same fixture state)") {
    def rows() = SparkEntry.queries("m33_sql_routed")(spark, dir)
      .orderBy("o_orderpriority").collect().toSeq
    val first = rows()
    val second = rows()
    assert(first == second, s"pass drift:\n$first\nvs\n$second")
  }

  test("eventsInRange equals events().filter on the normalized column " +
    "(pushdown-shaped slice loses no rows at either boundary)") {
    import org.apache.spark.sql.functions.col
    val lo = 1704672000L * 1000000000L // 2024-01-08T00:00:00Z
    val hi = 1705276800L * 1000000000L // 2024-01-15T00:00:00Z
    val slow = Queries.events(spark, dir)
      .filter(col("ts") >= lo && col("ts") < hi)
    val fast = Queries.eventsInRange(spark, dir, lo, hi)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() > 0, "window should be non-empty on the fixture")
  }

  test("from_json edge semantics (the e9 parse): a missing key, " +
    "malformed JSON, and an empty string all yield null, never an error") {
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import spark.implicits._
    val ks = Seq("""{"k": 5}""", """{"other": 1}""", "not json", "")
      .toDF("props")
      .select(from_json(col("props"),
        StructType(Seq(StructField("k", LongType)))).getField("k"))
      .as[Option[Long]].collect().toSeq
    assert(ks == Seq(Some(5L), None, None, None), ks.toString)
  }

  test("approx_count_distinct tracks the exact counts within its rsd bound") {
    // the declared query now carries its own acceptance: exact counts
    // (which must equal the s5 twin's) plus per-group |approx/exact−1| ≤
    // 0.05 verdicts computed in-engine
    val verdict = SparkEntry.queries("s10_approx_distinct")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val exact = SparkEntry.queries("s5_distinct_agg")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(verdict.keySet == exact.keySet)
    exact.foreach { case (k, (p, s)) =>
      val (np, ns, pOk, sOk) = verdict(k)
      assert(np == p && ns == s, s"$k exact counts drifted: ($np,$ns) vs ($p,$s)")
      assert(pOk && sOk, s"$k sketch outside 5%: $k")
    }
  }

  test("count-min sketch estimates heavy-hitter frequencies") {
    val cms = spark.read.parquet(s"$dir/lineitem.parquet")
      .stat.countMinSketch("l_returnflag", eps = 0.001, confidence = 0.99, seed = 42)
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val est = cms.estimateCount(flag)
      assert(est >= n && est <= (n * 1.01 + 100).toLong, s"$flag: $est vs $n")
    }
  }

  test("f3/f4 raw array variants agree with the serialized declared outputs") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    val f3raw = Queries.nestedArraysRaw(li)
      .select(col("l_orderkey"),
        array_join(col("statuses"), ",").as("statuses"),
        array_join(col("linenos").cast("array<string>"), ",").as("linenos"),
        col("n_lines"), col("has_open"), col("n_size"))
    val f3 = SparkEntry.queries("f3_nested_arrays")(spark, dir)
    assert(f3raw.exceptAll(f3).isEmpty && f3.exceptAll(f3raw).isEmpty)
    // array semantics: statuses is a distinct sorted set, linenos keeps dups
    val probe = Queries.nestedArraysRaw(li)
      .select(size(col("statuses")).as("ns"), col("n_lines"), col("n_size"))
      .agg(max(col("ns")).as("mx"), sum((col("n_size") === col("n_lines"))
        .cast("long")).as("eq"), count(lit(1)).as("n")).head()
    assert(probe.getAs[Int]("mx") <= 3)               // only F/O/P statuses
    assert(probe.getAs[Long]("eq") == probe.getAs[Long]("n"))

    val f4raw = Queries.higherOrderRaw(li)
      .select(col("l_orderkey"), col("l_linenumber"), col("tri"),
        array_join(col("squares").cast("array<string>"), ",").as("squares"),
        array_join(col("odds").cast("array<string>"), ",").as("odds"),
        col("has_mult5"))
    val f4 = SparkEntry.queries("f4_higher_order")(spark, dir)
    assert(f4raw.exceptAll(f4).isEmpty && f4.exceptAll(f4raw).isEmpty)
    // spot-check lambda semantics on a known n
    val r7 = Queries.higherOrderRaw(li).filter(col("l_linenumber") === 7).head()
    assert(r7.getAs[Long]("tri") == 28L)
    assert(r7.getAs[scala.collection.Seq[Long]]("squares") ==
      Seq(1L, 4L, 9L, 16L, 25L, 36L, 49L))
    assert(r7.getAs[scala.collection.Seq[Long]]("odds") == Seq(1L, 3L, 5L, 7L))
    assert(r7.getAs[Boolean]("has_mult5"))
  }

  test("every declared oracle has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("j4 (bucketed-layout join) ≡ the same join over the raw tables") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("price_cents"))
    val bucketed = SparkEntry.queries("j4_join_bucketed")(spark, dir)
    assert(bucketed.exceptAll(raw).isEmpty && raw.exceptAll(bucketed).isEmpty)
  }

  test("e7 (partitioned-layout DPP join) ≡ the day filter over raw events") {
    import org.apache.spark.sql.functions._
    val raw = Queries.events(spark, dir)
      .withColumn("event_day", expr("ts div 86400000000000"))
      .filter(pmod(col("event_day"), lit(7L)) <= 1)
      .groupBy(col("event_day").cast("long").as("event_day"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
    val dpp = SparkEntry.queries("e7_events_dpp")(spark, dir)
    assert(dpp.exceptAll(raw).isEmpty && raw.exceptAll(dpp).isEmpty)
  }

  test("s20: the percentile sketch lands inside the ±0.01-rank exact " +
    "bracket for every group (and the exact columns equal s8's)") {
    val rows = SparkEntry.queries("s20_approx_percentiles")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("ok25", "ok50", "ok75").foreach(c =>
        assert(r.getAs[Boolean](c), s"$c false for ${r.getString(0)}"))
    }
    val exact = SparkEntry.queries("s8_percentiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.foreach(r => assert(exact(r.getString(0)) ==
      ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))))
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
