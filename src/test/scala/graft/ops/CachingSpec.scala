package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Dedup

/**
 * Cache-lifecycle contract: operators that persist shared intermediates
 * internally (LSH indexes, the adaptive as-of hot-key set) must release
 * them when the caller's `Caching.scoped` block exits — a long-lived
 * session running many passes must not accumulate pinned storage — and
 * results must be identical with and without a scope.
 */
class CachingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "an utterly unrelated document about spark engines"),
    (3L, "the quick brown fox jumps over the lazy cat")
  ).toDF("doc_id", "text")

  // The contract is about the DELTA this test's operators create, not
  // global emptiness: other suites may legitimately hold pinned storage
  // that outlives their calls (a connected-components result is a
  // localCheckpoint over a pinned RDD until the caller drops it), and
  // suite ordering must not decide whether this spec passes.
  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("scoped dedup pass releases every internal persist; results identical") {
    spark.catalog.clearCache() // leftovers from other suites
    val base = persistedIds

    var inScope = Set.empty[Int]
    val scoped = Caching.scoped {
      val pairs = Dedup.minhashLshPairs(docs).collect()
      inScope = persistedIds -- base
      pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(inScope.nonEmpty, "the LSH index should be persisted inside the scope")
    assert((persistedIds -- base).isEmpty,
      "scope exit must unpersist operator-internal caches")

    val unscoped = Dedup.minhashLshPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scoped == unscoped && scoped.contains((0L, 1L)))
    spark.catalog.clearCache()
  }

  test("scoped adaptive as-of releases the hot-key set; results identical") {
    spark.catalog.clearCache()
    val base = persistedIds
    val left = Seq(("a", 10L, 1L), ("b", 5L, 2L)).toDF("k", "lt", "lid")
    val right = Seq(("a", 7L, 100L), ("b", 9L, 200L)).toDF("k", "rt", "rid")

    val scoped = Caching.scoped {
      AsofJoin.asofJoinAdaptive(left, right, "k", col("lt"), col("rt"),
        Seq("rid"), rightOrd = col("rid"), hotThreshold = 1L)(
        t => floor(t / 7).cast("long"))
        .as[(String, Long, Long, Option[Long])].collect().toSet
    }
    assert((persistedIds -- base).isEmpty,
      "scope exit must unpersist the adaptive hot-key set")
    assert(scoped == Set(("a", 10L, 1L, Some(100L)), ("b", 5L, 2L, None)))
  }

  test("scopes nest: inner scope releases only its own registrations") {
    spark.catalog.clearCache()
    val outer = Caching.register(docs.select(col("doc_id")))
    Caching.scoped {
      Caching.scoped {
        Caching.register(docs.select(col("text"))).count()
      }
      // outer DF registered OUTSIDE any scope must still be persisted
      assert(outer.storageLevel.useMemory || outer.storageLevel.useDisk)
    }
    assert(outer.storageLevel.useMemory || outer.storageLevel.useDisk)
    outer.unpersist(blocking = false)
    spark.catalog.clearCache()
  }
}
