package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/**
 * Library entry points.
 *
 * [[GraftExtensions]] registers the custom Catalyst expressions for SQL use
 * via the standard `spark.sql.extensions=graft.GraftExtensions` mechanism
 * (cluster-wide, survives session cloning); [[GraftSession]] builds a
 * locally-configured session with the same functions plus the configs the
 * engine assumes (UTC, AQE with skew handling, nanosecond-parquet reads).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** name → (usage, builder) for every custom expression. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("tokens_lc", "tokens_lc(text) - lowercase alphanumeric tokens",
      es => TokensLc(es.head)),
    ("shingle_set", "shingle_set(tokens, k) - distinct word k-shingles",
      es => ShingleSet(es.head, intArg(es(1), "k"))),
    ("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint",
      es => SimHash64(es.head)),
    ("minhash_sig", "minhash_sig(shingles, h) - h-hash MinHash signature",
      es => MinHashSignature(es.head, intArg(es(1), "h"))),
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of float vectors",
      es => CosineSimilarity(es(0), es(1))),
    ("fingerprint64", "fingerprint64(tokens) - positional rolling-hash fingerprint",
      es => Fingerprint64(es.head)),
    ("bpe_merge_pair",
      "bpe_merge_pair(syms, a, b) - one BPE training-step merge of the literal pair (a, b)",
      es => BpeMergePair(es.head, strArg(es(1), "a"), strArg(es(2), "b"))),
    ("ngram_hash64",
      "ngram_hash64(tokens, n) - mix64-fnv1a hashes of every word k-gram, k = 1..n",
      es => NgramHash64(es.head, intArg(es(1), "n"))),
    ("hash_buckets",
      "hash_buckets(hashes, buckets, distinct) - feature-hash bucket ids (buckets a power of two; distinct = 0/1)",
      es => HashBuckets(es.head, intArg(es(1), "buckets"),
        intArg(es(2), "distinct") != 0)))

  def inject(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, usage), builder))
    }
    // SQL row-level DML on graft tables (DELETE/UPDATE/MERGE +
    // partitioned INSERT) — resolution-batch conversion to the
    // manifest's transactional ops; see graft.io.GraftDmlRule
    ext.injectResolutionRule(session => graft.io.GraftDmlRule(session))
  }
}

object GraftSession {

  /** Session configured for this engine. `shufflePartitions` should track
    * cluster parallelism (set to 2-3× total executor cores in production;
    * AQE coalesces the excess). */
  def create(appName: String = "graft",
             master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
             shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    // getOrCreate returns any pre-existing session (whose extensions are
    // frozen) — registering on the function registry covers that path too.
    GraftFunctions.register(spark)
    spark
  }
}
