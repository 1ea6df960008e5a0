package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Dedup

/**
 * Seeded randomized properties: each scale-optimized operator is checked
 * against a naive in-memory reference implementation on many random
 * inputs — the shapes a hand-picked fixture can miss (duplicate
 * timestamps, all-in-one-bucket, disconnected blobs, degenerate sizes).
 * Seeds are fixed, so failures reproduce.
 */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin (plain and salted) equals the naive reference on random data") {
    val rnd = new Random(1234)
    for (round <- 1 to 5) {
      val keys = Seq("a", "b", "c")
      val right = Seq.tabulate(30)(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(40).toLong, i.toLong)) // (k, t, rid)
      val left = Seq.tabulate(40)(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, i.toLong)) // (k, t, lid)

      // naive: latest right with rt <= lt, ties by max rid
      val expect = left.map { case (k, lt, lid) =>
        val m = right.filter(r => r._1 == k && r._2 <= lt)
        val best = if (m.isEmpty) None
          else Some(m.maxBy(r => (r._2, r._3)))
        (lid, best.map(_._3))
      }.toMap

      val lDf = left.toDF("k", "lt", "lid")
      val rDf = right.toDF("k", "rt", "rid")
      def check(out: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val got = out.select("lid", "rid")
          .as[(Long, Option[Long])].collect().toMap
        assert(got == expect, s"round $round $tag")
      }
      check(AsofJoin.asofJoin(lDf, rDf, "k", col("lt"), col("rt"),
        Seq("rid"), rightOrd = col("rid")), "plain")
      check(AsofJoin.asofJoinSalted(lDf, rDf, "k", col("lt"), col("rt"),
        Seq("rid"), rightOrd = col("rid"))(t => floor(t / 7).cast("long")),
        "salted")
      // adaptive at thresholds that force a MIXED hot/cold split (~23
      // rows per key per side), all-hot, and all-cold routing
      Seq(0L, 20L, 999L).foreach { thr =>
        check(AsofJoin.asofJoinAdaptive(lDf, rDf, "k", col("lt"), col("rt"),
          Seq("rid"), rightOrd = col("rid"), hotThreshold = thr)(
          t => floor(t / 7).cast("long")), s"adaptive(thr=$thr)")
      }
    }
  }

  test("asofJoinAdaptive null-key rows: hot-routed when heavy, result-identical") {
    val rnd = new Random(4321)
    // null is a windowable key value for the plain variant (partitionBy
    // groups nulls together), so every variant must agree on it — and a
    // null-HEAVY input must reach the salted branch (null-safe routing),
    // not silently bypass the hot-key protection via equi-join semantics.
    val right = Seq.tabulate(40)(i =>
      (if (i % 4 == 0) "a" else null, rnd.nextInt(40).toLong, i.toLong))
    val left = Seq.tabulate(60)(i =>
      (if (i % 5 == 0) "a" else null, rnd.nextInt(50).toLong, i.toLong))

    val expect = left.map { case (k, lt, lid) =>
      val m = right.filter(r => r._1 == k && r._2 <= lt)
      (lid, if (m.isEmpty) None else Some(m.maxBy(r => (r._2, r._3))._3))
    }.toMap

    val lDf = left.toDF("k", "lt", "lid")
    val rDf = right.toDF("k", "rt", "rid")
    def got(out: org.apache.spark.sql.DataFrame) = out.select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    val plain = got(AsofJoin.asofJoin(lDf, rDf, "k", col("lt"), col("rt"),
      Seq("rid"), rightOrd = col("rid")))
    assert(plain == expect)
    // thr=30: ~78 null rows vs ~22 'a' rows — ONLY the null key is hot;
    // thr=0: everything (incl. nulls) salted; thr=999: everything cold
    Seq(0L, 30L, 999L).foreach { thr =>
      val adaptive = got(AsofJoin.asofJoinAdaptive(lDf, rDf, "k",
        col("lt"), col("rt"), Seq("rid"), rightOrd = col("rid"),
        hotThreshold = thr)(t => floor(t / 7).cast("long")))
      assert(adaptive == expect, s"thr=$thr")
    }
    // and the salted variant alone handles null keys (null-safe carry-in)
    val salted = got(AsofJoin.asofJoinSalted(lDf, rDf, "k", col("lt"),
      col("rt"), Seq("rid"), rightOrd = col("rid"))(
      t => floor(t / 7).cast("long")))
    assert(salted == expect)
  }

  test("bucketed percentiles equal a naive sorted-interpolation reference") {
    val rnd = new Random(99)
    for (round <- 1 to 5) {
      val data = Seq.tabulate(200)(_ =>
        (s"g${rnd.nextInt(4)}", math.floor(rnd.nextDouble() * 1000) / 10))
      val ps = Seq(0.1, 0.5, 0.9)
      val expect = data.groupBy(_._1).map { case (g, rows) =>
        val v = rows.map(_._2).sorted
        g -> ps.map { p =>
          val h = (v.length - 1) * p
          val lo = h.toInt
          val frac = h - lo
          val hi = if (lo + 1 < v.length) v(lo + 1) else v(lo)
          v(lo) * (1.0 - frac) + hi * frac
        }
      }
      val got = Percentiles.exactPercentilesBucketed(
        data.toDF("k", "v"), Seq("k"), "v", ps)(x => floor(x / 13).cast("long"))
        .collect().map(r => r.getString(0) ->
          Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      expect.foreach { case (g, e) =>
        e.zip(got(g)).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, s"round $round group $g: $e vs ${got(g)}")
        }
      }
    }
  }

  test("connectedComponents equals a naive union-find on random graphs") {
    val rnd = new Random(7)
    for (round <- 1 to 5) {
      val n = 40
      val edges = Seq.tabulate(25)(_ => {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a)
      }).filter(e => e._1 != e._2).distinct

      // naive union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = (0 until n).map(v => v.toLong -> find(v).toLong).toMap

      val got = Dedup.connectedComponents(
        (0L until n.toLong).toDF("doc_id"), edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"round $round")
    }
  }

  test("chunking reconstructs every random document exactly") {
    val rnd = new Random(5)
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, Random.javaRandomToRandom(new java.util.Random(rnd.nextLong()))
        .alphanumeric.take(rnd.nextInt(1200)).mkString))
    val out = graft.ext.TextAnalysis.chunkDocs(docs.toDF("doc_id", "text"),
      chunkSize = 100, stride = 70)
      .as[(Long, Int, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.foreach { case (id, text) =>
      val chunks = out(id)
      // stride-prefix concatenation + last tail == original text
      val rebuilt = chunks.dropRight(1).map(_._3.take(70)).mkString + chunks.last._3
      assert(rebuilt == text, s"doc $id len ${text.length}")
      // every chunk except the last is full-size or the doc is short
      chunks.dropRight(1).foreach(c => assert(c._4 == 100L))
    }
  }

  test("range join equals the naive range predicate on random windows") {
    val rnd = new Random(17)
    for (round <- 1 to 5) {
      // random (possibly negative/asymmetric) window, random timestamps
      // with heavy key collision — band borders land between/on events
      val lower = rnd.nextInt(60) - 30
      val upper = lower + rnd.nextInt(60)
      val left = Seq.tabulate(80)(_ =>
        (s"k${rnd.nextInt(4)}", rnd.nextInt(300).toLong)).toDF("key", "lt")
      val right = Seq.tabulate(80)(_ =>
        (s"k${rnd.nextInt(4)}", rnd.nextInt(300).toLong)).toDF("key", "rt")
      val naive = left.join(right, Seq("key"))
        .filter(col("rt") >= col("lt") + lower && col("rt") <= col("lt") + upper)
      val banded = RangeJoin.rangeJoin(left, right, "key", "lt", "rt",
        lower, upper)
      assert(banded.count() == naive.count(),
        s"round $round window [$lower,$upper]")
      assert(banded.except(naive).isEmpty && naive.except(banded).isEmpty,
        s"round $round window [$lower,$upper]")
    }
  }

  test("top_k_by bounded heap equals naive sort-take across partition merges") {
    import graft.functions.TopKByScore.top_k_by
    val rnd = new Random(31)
    for (round <- 1 to 5) {
      // coarse scores force ties → exercises the deterministic id tie-break;
      // repartition(7) forces the partial/merge path of the aggregate
      val data = Seq.tabulate(400)(i =>
        (s"q${rnd.nextInt(8)}", i.toLong, (rnd.nextInt(20) / 4.0)))
      val expect = data.groupBy(_._1).map { case (q, rows) =>
        q -> rows.map(r => (r._3, r._2)).sortBy(r => (-r._1, r._2)).take(5)
          .map(r => (r._2, r._1))
      }
      val got = data.toDF("q", "id", "score").repartition(7)
        .groupBy("q").agg(top_k_by(col("score"), col("id"), 5).as("topk"))
        .select(col("q"), explode(col("topk")).as("hit"))
        .select(col("q"), col("hit.id"), col("hit.score"))
        .as[(String, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
      expect.foreach { case (q, e) =>
        assert(got(q) == e, s"round $round query $q: ${got(q)} vs $e")
      }
    }
  }

  test("bounded_min_ids equals naive sorted-take with exact totals across merges") {
    import graft.functions.BoundedMinIds.bounded_min_ids
    val rnd = new Random(47)
    for (round <- 1 to 5) {
      // duplicate ids allowed; repartition(7) forces the partial/merge path
      val data = Seq.tabulate(300)(_ =>
        (s"b${rnd.nextInt(6)}", rnd.nextInt(80).toLong))
      val expect = data.groupBy(_._1).map { case (b, rows) =>
        b -> (rows.map(_._2).sorted.take(9), rows.size.toLong)
      }
      val got = data.toDF("b", "id").repartition(7)
        .groupBy("b").agg(bounded_min_ids(col("id"), 9).as("bk"))
        .select(col("b"), col("bk.ids"), col("bk.total"))
        .as[(String, Seq[Long], Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      expect.foreach { case (b, (ids, total)) =>
        assert(got(b)._1 == ids, s"round $round bucket $b ids")
        assert(got(b)._2 == total, s"round $round bucket $b total")
      }
    }
  }

  test("packBins offsets: (bin, offset) equals the in-memory prefix sum " +
    "over the pack order on random corpora, at any parallelism") {
    val rnd = new Random(6060)
    for (trial <- 0 until 3) {
      val n = 30 + rnd.nextInt(120)
      val budget = 50L + rnd.nextInt(100)
      val rows = (0L until n.toLong).map { id =>
        (id, s"l${rnd.nextInt(3)}", rnd.nextInt(60).toLong)
      }
      val got = graft.Queries.packBins(
          rows.toDF("doc_id", "lang", "n_chars").repartition(2 + trial * 5),
          budget = budget, withOffset = true)
        .select("doc_id", "bin", "offset")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      // in-memory: pack order within lang is (sub = id % 16, id)
      val expect = rows.groupBy(_._2).flatMap { case (_, docs) =>
        var pos = 0L
        docs.sortBy { case (id, _, _) => (id % 16, id) }.map {
          case (id, _, m) =>
            val out = id -> (pos / budget, pos % budget)
            pos += m
            out
        }
      }
      assert(got == expect, s"trial $trial budget $budget")
    }
  }

  test("shuffle shards: dense per-shard order, hash-determined shard, " +
    "identical across partition layouts") {
    def limbHash(id: Long): Long =
      ((id % 2097152L) * 2654435761L
        + ((id / 2097152L) % 2097152L) * 2246822519L
        + (id / 4398046511104L) * 3266489917L) % 4294967296L
    def run(parts: Int): Map[Long, (Long, Long)] = {
      // same expressions as the declared ext_shuffle_shards query, with
      // the input laid out differently
      val h = expr(
        """pmod(pmod(doc_id, 2097152) * 2654435761L
          |   + pmod(doc_id DIV 2097152, 2097152) * 2246822519L
          |   + (doc_id DIV 4398046511104) * 3266489917L, 4294967296L)"""
          .stripMargin)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("hv"), col("doc_id"))
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .repartition(parts)
        .select(col("doc_id"), h.as("hv"), pmod(h, lit(8L)).as("shard"))
        .withColumn("ord", row_number().over(w).cast("long"))
        .select("doc_id", "shard", "ord")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }
    val got = run(1)
    assert(got == run(7)) // layout-independent
    got.foreach { case (id, (shard, _)) =>
      assert(shard == limbHash(id) % 8L, s"doc $id")
    }
    // per-shard orders are dense 1..count and follow (hash, id)
    got.groupBy(_._2._1).foreach { case (shard, docs) =>
      val ords = docs.values.map(_._2).toSeq.sorted
      assert(ords == (1L to docs.size.toLong), s"shard $shard")
      val byOrd = docs.toSeq.sortBy(_._2._2).map(_._1)
      val expected = docs.keys.toSeq.sortBy(id => (limbHash(id), id))
      assert(byOrd == expected, s"shard $shard order")
    }
  }

  test("split assignment is invariant under repartitioning") {
    val docs = spark.range(0, 3000).select(col("id").as("doc_id"),
      concat(lit("l"), pmod(col("id"), lit(4))).as("lang"))
    def splits(parts: Int) = {
      // same limb-hash expression as the declared ext_split_assign query
      docs.repartition(parts).select(col("doc_id"),
        expr("""pmod(pmod(doc_id, 2097152) * 2654435761L
               |   + pmod(doc_id DIV 2097152, 2097152) * 2246822519L
               |   + (doc_id DIV 4398046511104) * 3266489917L, 4294967296L)"""
          .stripMargin).as("hv"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(splits(1) == splits(13))
  }

  test("bucketed global rank equals a naive total sort on random data") {
    val rnd = new Random(99)
    for (round <- 1 to 5) {
      val n = 1 + rnd.nextInt(400)
      // values may be negative, duplicated, and bucket-boundary-heavy
      val rows = Seq.tabulate(n)(i =>
        ((rnd.nextInt(40) - 20).toDouble, i.toLong)) // (v, id) — id unique
      val expect = rows.sortBy { case (v, id) => (v, id) }
        .zipWithIndex.map { case ((_, id), i) => id -> (i + 1).toLong }.toMap
      val got = Ranks.withGlobalRank(rows.toDF("v", "id"),
        order = Seq(col("v"), col("id")),
        bucket = floor(col("v") / 7).cast("long"))
        .select("id", "__r", "__n")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got.view.mapValues(_._1).toMap == expect, s"round $round")
      assert(got.values.forall(_._2 == n.toLong), s"round $round n")
    }
  }

  test("topKByCountDesc equals a naive full sort on Zipfian counts") {
    val rnd = new Random(21)
    for (round <- 1 to 5) {
      val n = 200 + rnd.nextInt(800)
      // Zipf-shaped counts: a few huge counts, a heavy cnt=1 tail, and
      // massive tie runs — the shape whose boundary ties and hot tail
      // the histogram threshold must handle exactly
      val rows = Seq.tabulate(n)(i => (f"w${rnd.nextInt(1000000)}%07d_$i",
        math.max(1L, (n / (i + 1)).toLong)))
      // limits landing inside tie runs, at 1, and beyond the table size
      val limit = 1 + rnd.nextInt(n + 50)
      val expect = rows.sortBy { case (w, c) => (-c, w) }
        .take(limit).zipWithIndex
        .map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
      val got = Ranks.topKByCountDesc(rows.toDF("word", "cnt"), "cnt",
        order = Seq(col("cnt").desc, col("word")),
        bucket = -length(bin(col("cnt"))).cast("long"), limit = limit)
        .select("word", "__r")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"round $round n=$n limit=$limit")
    }
  }

  test("derived ntile/percent_rank/cume_dist equal Spark's window functions") {
    // the s19 arithmetic (rank → bucket-size formula) must agree with the
    // engine's own ntile for every n-vs-k remainder shape, including n < k
    val rnd = new Random(7)
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 3, 9, 10, 11, 25, 64, 100, 137)) {
      val rows = Seq.tabulate(n)(i => (rnd.nextInt(50).toDouble, i.toLong))
      val df = rows.toDF("v", "id")
      val w = Window.orderBy(col("v"), col("id"))
      val builtin = df.select(col("id"),
        ntile(10).over(w).as("decile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
      val derived = graft.ops.Ranks.withGlobalRank(df,
        order = Seq(col("v"), col("id")),
        bucket = floor(col("v") / 11).cast("long"))
        .selectExpr("id",
          """CAST(CASE WHEN __r <= (__n % 10) * (__n DIV 10 + 1)
            |  THEN (__r - 1) DIV (__n DIV 10 + 1) + 1
            |  ELSE __n % 10
            |    + (__r - 1 - (__n % 10) * (__n DIV 10 + 1))
            |      DIV greatest(__n DIV 10, 1) + 1
            |END AS INT) AS decile""".stripMargin,
          "CASE WHEN __n > 1 THEN CAST(__r - 1 AS DOUBLE) / (__n - 1) " +
            "ELSE CAST(0.0 AS DOUBLE) END AS pct_rank",
          "CAST(__r AS DOUBLE) / __n AS cum_dist")
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(derived == builtin, s"n=$n")
    }
  }

  test("repeatedChunkStrip equals a naive in-memory reference on random " +
    "small-vocab corpora (forced chunk collisions, varied window/df)") {
    val vocab = Array("ax", "by", "cz", "dw")
    val rnd = new Random(777)
    for (round <- 1 to 6) {
      val w = 1 + rnd.nextInt(4) // chunk window 1..4
      val maxDf = 2 + rnd.nextInt(2) // 2..3
      val docs = Seq.tabulate(20) { i =>
        val n = rnd.nextInt(12) // includes empty docs
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      // naive: chunk -> distinct-doc df -> strip -> reassemble
      def chunksOf(text: String): Seq[String] = {
        val tk = text.split(" ").filter(_.nonEmpty)
        tk.grouped(w).map(_.mkString(" ")).toSeq
      }
      val df = docs.flatMap { case (id, t) => chunksOf(t).distinct.map((_, id)) }
        .groupBy(_._1).map { case (c, xs) => c -> xs.size }
      val expect = docs.map { case (id, t) =>
        val kept = chunksOf(t).filter(c => df(c) < maxDf)
        val dropped = chunksOf(t).size - kept.size
        id -> ((kept.mkString(" "), kept.size.toLong, dropped.toLong))
      }.toMap

      val got = Caching.scoped {
        graft.ext.Curation.repeatedChunkStrip(
          docs.toDF("doc_id", "text"), chunkWords = w, maxDf = maxDf)
          .as[(Long, String, Long, Long)].collect()
      }.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expect, s"round $round w=$w maxDf=$maxDf")
    }
  }

  test("bigramRefScore equals a naive in-memory bigram model on random " +
    "corpora (shared and unseen bigrams, short docs)") {
    val vocab = Array("p", "q", "r", "s", "t")
    val rnd = new Random(4242)
    for (round <- 1 to 5) {
      def mkDocs(base: Long, k: Int) = Seq.tabulate(k) { i =>
        val n = rnd.nextInt(9) // includes 0- and 1-token docs
        (base + i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val corpus = mkDocs(0L, 15)
      val ref = mkDocs(100L, 6)
      def bigrams(t: String): Seq[String] = {
        val tk = t.split(" ").filter(_.nonEmpty)
        if (tk.length < 2) Seq.empty
        else tk.sliding(2).map(_.mkString(" ")).toSeq
      }
      val model = ref.flatMap(d => bigrams(d._2))
        .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
      val expect = corpus.map { case (id, t) =>
        val bs = bigrams(t)
        val hits = bs.map(b => model.getOrElse(b, 0L)).sum
        val score = if (bs.isEmpty) 0.0 else hits.toDouble / bs.size
        id -> ((hits, bs.size.toLong, score))
      }.toMap

      val got = graft.ext.Curation.bigramRefScore(
        corpus.toDF("doc_id", "text"), ref.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expect, s"round $round")
    }
  }

  test("eventsInRange equals filter-after-normalize at random µs-aligned " +
    "bounds, including empty and full windows") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.Queries.events(spark, dir)
      .select("event_id", "ts").as[(Long, Long)].collect()
    val (minTs, maxTs) = (all.map(_._2).min, all.map(_._2).max)
    val rnd = new Random(777)
    def align(x: Long) = x - java.lang.Math.floorMod(x, 1000L)
    val windows = Seq(
      (align(minTs), align(maxTs) + 1000),            // full
      (align(minTs) - 5000, align(minTs) - 1000),     // empty, before
      (align(maxTs) + 1000, align(maxTs) + 5000),     // empty, after
      (align(minTs), align(minTs))                    // degenerate lo==hi
    ) ++ (1 to 5).map { _ =>
      val a = align(minTs + (rnd.nextDouble() * (maxTs - minTs)).toLong)
      val b = align(minTs + (rnd.nextDouble() * (maxTs - minTs)).toLong)
      (math.min(a, b), math.max(a, b))
    }
    windows.foreach { case (lo, hi) =>
      val expect = all.filter(e => e._2 >= lo && e._2 < hi).map(_._1).toSet
      val got = graft.Queries.eventsInRange(spark, dir, lo, hi)
        .select("event_id").as[Long].collect().toSet
      assert(got == expect, s"window [$lo, $hi)")
    }
  }
}
