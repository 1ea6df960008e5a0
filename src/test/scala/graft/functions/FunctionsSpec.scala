package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextAnalysis
import graft.functions.GraftFunctions._
import graft.functions.TopKByScore.top_k_by

/** Custom Catalyst expressions + aggregate (SURVEY §7.3 custom work). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "The quick brown fox jumps over the lazy dog",
    "", "!!! ??? ...", "a b", "Tabs\tand\nnewlines  here",
    "MiXeD CaSe 123 abc123def", "unicode Éé ß ñ 中文 test")

  test("tokens_lc kernel ≡ lower+split+filter column algebra") {
    val df = texts.toDF("text")
    val mismatches = df.select(
      tokens_lc(col("text")).as("kernel"),
      TextAnalysis.tokens(col("text")).as("algebra"))
      .filter(not(col("kernel") === col("algebra")))
      .count()
    assert(mismatches == 0)
  }

  test("tokens_word kernel ≡ split(lower, \\W+) minus empties") {
    val df = (texts :+ "under_score keeps_underscores x__y").toDF("text")
    val mismatches = df.select(
      tokens_word(col("text")).as("kernel"),
      filter(split(lower(col("text")), "\\W+"), t => t =!= "").as("algebra"))
      .filter(not(col("kernel") === col("algebra")))
      .count()
    assert(mismatches == 0)
  }

  test("shingle_set kernel ≡ array_distinct(wordShingles) as a set") {
    val df = texts.toDF("text").select(TextAnalysis.tokens(col("text")).as("t"))
    val rows = df.select(
      shingle_set(col("t"), 3).as("kernel"),
      array_distinct(TextAnalysis.wordShingles(col("t"), 3)).as("algebra"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (k, a) => assert(k.toSet == a.toSet && k.length == a.length) }
  }

  test("shingle_set below k tokens is empty") {
    val out = Seq("one two").toDF("text")
      .select(shingle_set(tokens_lc(col("text")), 3))
      .as[Seq[String]].head()
    assert(out.isEmpty)
  }

  test("simhash64: identical token sets collide, disjoint ones differ") {
    val df = Seq("the quick brown fox", "the quick brown fox",
      "totally different words entirely").toDF("text")
      .select(simhash64(tokens_lc(col("text"))).as("h")).as[Long].collect()
    assert(df(0) == df(1))
    assert(df(0) != df(2))
  }

  test("minhash signature similarity estimates Jaccard") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (21 to 120).map(i => s"sh$i") // true jaccard = 80/120 ≈ 0.667
    val df = Seq(a, b).toDF("sh")
      .select(minhash_sig(col("sh"), 256).as("sig")).as[Seq[Long]].collect()
    val est = df(0).zip(df(1)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 0.667) < 0.12, s"estimate $est")
  }

  test("cosine_sim matches a hand computation and handles edge cases") {
    val df = Seq(
      (Array(1f, 0f, 1f), Array(1f, 0f, 1f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(df(0) - 1.0) < 1e-12)
    assert(df(1) == 0.0)
    assert(math.abs(df(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f)), (Array(0f, 0f), Array(1f, 1f)))
      .toDF("a", "b").select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(bad.forall(_.isNaN))
  }

  test("fingerprint64 is positional (token order matters)") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(fingerprint64(tokens_lc(col("text")))).as[Long].collect()
    assert(df(0) == df(2))
    assert(df(0) != df(1))
  }

  test("top_k_by keeps the k best with deterministic ties, across partitions") {
    val df = (1L to 1000L).map(i => (i, (i % 100).toDouble)).toDF("id", "score")
      .repartition(7)
    val top = df.agg(top_k_by(col("score"), col("id"), 5))
      .as[Seq[(Double, Long)]].head()
    // best score 99.0 held by ids 99,199,…; ties break by ascending id
    assert(top == Seq((99.0, 99L), (99.0, 199L), (99.0, 299L), (99.0, 399L), (99.0, 499L)))
  }

  test("nearest_centroids assigns the closest cell, ties by index") {
    // two orthogonal centroids in 2-d, flattened row-major
    val cents = Array(1f, 0f, 0f, 1f)
    val out = Seq(Array(0.9f, 0.1f), Array(0.1f, 0.9f), Array(1f, 1f))
      .toDF("v")
      .select(nearest_centroids(col("v"), cents, 2, 2).as("buckets"))
      .as[Seq[Int]].collect()
    assert(out(0) == Seq(0, 1)) // closest to x-axis centroid first
    assert(out(1) == Seq(1, 0))
    assert(out(2) == Seq(0, 1)) // exact tie → ascending index
  }

  test("srp_sign is deterministic and scale-invariant") {
    val out = Seq(Array(0.5f, -1f, 2f), Array(0.5f, -1f, 2f), Array(1f, -2f, 4f),
      Array(-0.5f, 1f, -2f))
      .toDF("v").select(srp_sign(col("v"), 16)).as[Long].collect()
    assert(out(0) == out(1))        // deterministic
    assert(out(0) == out(2))        // positive scaling keeps signs
    assert(out(0) != out(3))        // negation flips signs
    assert(out(0) >= 0 && out(0) < (1L << 16))
  }

  test("SQL registration exposes the expressions to spark.sql") {
    GraftFunctions.register(spark)
    Seq("hello world").toDF("text").createOrReplaceTempView("t_reg")
    val n = spark.sql(
      "SELECT simhash64(ARRAY('a','b')) AS h, fingerprint64(ARRAY('a')) AS f FROM t_reg")
      .count()
    assert(n == 1)
  }

  test("bpe_merge_pair is SQL-callable with literal pair args and merges " +
    "leftmost-first non-overlapping") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT bpe_merge_pair(ARRAY('a','a','a','b'), 'a', 'a') AS m")
      .as[Seq[String]].collect().head
    assert(got == Seq("aa", "a", "b"))
  }
}
