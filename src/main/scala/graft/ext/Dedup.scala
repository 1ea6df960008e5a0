package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Caching

/**
 * Deduplication operators for LLM training-data pipelines
 * (extension layer, SURVEY.md §7.3): exact, MinHash+LSH, SimHash,
 * n-gram Jaccard, embedding-cosine near-dup.
 *
 * Cache lifecycle: the LSH pipelines persist their shared index
 * intermediates (MEMORY_AND_DISK — spillable, LRU-evicted) via
 * [[graft.ops.Caching.register]]. Wrap build-then-materialize in
 * `Caching.scoped { … }` to release them when the pass completes;
 * without a scope they live for the session (release with
 * `spark.catalog.clearCache()`).
 *
 * 100 TB design rules applied throughout (SURVEY.md §7.4 item 8):
 *  - group/join keys are fixed-width digests or band hashes, never raw text,
 *    so shuffles carry O(bytes-of-key) not O(bytes-of-doc);
 *  - candidate generation is always blocked (LSH bands / inverted index with
 *    a document-frequency cut), never a cartesian product;
 *  - every aggregation is partial-aggregable (map-side combine applies);
 *  - no `collect()` on any data path.
 */
object Dedup {

  /** Current data dir of a versioned index component (manifest-committed
    * compaction, [[graft.io.Tables.resolveComponent]]); flat legacy dirs
    * resolve to themselves. Every component read AND append goes through
    * this, so compaction can swap versions under concurrent readers. */
  private def comp(spark: org.apache.spark.sql.SparkSession,
                   dir: String): String =
    graft.io.Tables.resolveComponent(spark, dir)

  /** Cumulative candidate-cap counters: multi-id buckets seen, buckets
    * truncated by the skew cap, and candidate ids dropped by it.
    * `droppedIds > 0` bounds measured recall — the cap is visible, never
    * silent. */
  final case class CapStats(buckets: Long, truncatedBuckets: Long,
                            droppedIds: Long)

  // Named LongAccumulators (one trio per SparkContext, shown in the Spark
  // UI): unlike `observe` metrics — which attach to one QueryExecution
  // and are invisible when the result is consumed via `df.write` — these
  // count for ANY action. Task retries can over-count slightly; they are
  // observability counters, not exact billing.
  private val capAccs = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext,
    (org.apache.spark.util.LongAccumulator,
     org.apache.spark.util.LongAccumulator,
     org.apache.spark.util.LongAccumulator)]()

  private def accsFor(sc: org.apache.spark.SparkContext) =
    capAccs.computeIfAbsent(sc, s =>
      (s.longAccumulator("graft.dedup.cap.buckets"),
        s.longAccumulator("graft.dedup.cap.truncated_buckets"),
        s.longAccumulator("graft.dedup.cap.dropped_ids")))

  /** Read the cumulative cap counters for this session (since start or
    * the last [[capStatsReset]]). */
  def capStats(spark: org.apache.spark.sql.SparkSession): CapStats = {
    val (b, t, d) = accsFor(spark.sparkContext)
    CapStats(b.value, t.value, d.value)
  }

  /** Zero the cap counters (e.g. per dedup pass, to attribute drops). */
  def capStatsReset(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (b, t, d) = accsFor(spark.sparkContext)
    b.reset(); t.reset(); d.reset()
  }

  /** One-row DataFrame snapshot of [[capStats]] — the queryable artifact
    * form, so a pipeline can record the drop counters NEXT TO its results
    * (write both to the same output root) instead of reading a
    * session-API value that dies with the session. Snapshot semantics:
    * call AFTER materializing the dedup result it should describe. */
  def capStatsDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val s = capStats(spark)
    import spark.implicits._
    Seq((s.buckets, s.truncatedBuckets, s.droppedIds))
      .toDF("buckets", "truncated_buckets", "dropped_ids")
  }

  /**
   * Candidate generation shared by every LSH family: group rows by bucket
   * key(s), enumerate in-bucket id pairs, dedupe across buckets. ONE
   * shuffle of the bucketed rows — a self-join would shuffle both sides
   * and hash-build the full set. Skew guard: pairs enumerate over the
   * `maxBucket` smallest ids per bucket (sorted → deterministic);
   * larger buckets are near-identical mass that exact dedup upstream
   * should have removed, and O(maxBucket²) bounds task memory and fan-out.
   * The cap applies MAP-SIDE, not post-collect: `bounded_min_ids` is a
   * TypedImperativeAggregate (size-maxBucket heap + exact count), so
   * partial aggregation keeps at most maxBucket ids per bucket per
   * partition and at most that many cross the shuffle — `collect_list`
   * + slice would buffer the WHOLE hot bucket in one task before
   * capping (an OOM on a billion-duplicate bucket). And it is
   * OBSERVABLE, never silent: per-session accumulators (readable via
   * [[capStats]], visible in the Spark UI) count buckets hit, buckets
   * truncated, and ids dropped, with drops exact (total - kept).
   * `bucketed` must have a long `id` column plus `keyCols`.
   *
   * Counter stability: the counting stage is persisted, so any number of
   * actions over the result (or over several downstream consumers) fire
   * the accumulators ONCE — an uncached plan would re-execute the stage
   * per action and double-count. Task retries and cache eviction under
   * memory+disk pressure can still over-count; these are observability
   * counters, not exact billing.
   */
  private[ext] def bucketPairs(bucketed: DataFrame, keyCols: Seq[String],
                               maxBucket: Int = 1000): DataFrame = {
    import graft.functions.BoundedMinIds.bounded_min_ids
    val (accB, accT, accD) = accsFor(bucketed.sparkSession.sparkContext)
    val session = bucketed.sparkSession
    import session.implicits._
    bucketed.groupBy(keyCols.map(col): _*)
      .agg(bounded_min_ids(col("id"), maxBucket).as("bk"))
      .filter(col("bk.total") > 1)
      .select(col("bk.ids").as("ids"), col("bk.total").as("total"))
      .as[(Seq[Long], Long)]
      .mapPartitions { it =>
        it.map { case (ids, total) =>
          accB.add(1L)
          if (total > ids.length) {
            accT.add(1L)
            accD.add(total - ids.length)
          }
          ids // already the maxBucket smallest, ascending
        }
      }
      .toDF("ids")
      // pin the counted stage: bounded size (≤ maxBucket ids per
      // multi-id bucket), spillable; scope-released (see class doc)
      .transform(df => Caching.register(df))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /**
   * Exact dedup: group on a 256-bit content digest, keep the smallest id.
   * Grouping on `sha2(text)` instead of `text` keeps shuffle rows at
   * ~40 bytes regardless of document size.
   */
  def exact(df: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    df.groupBy(sha2(col(textCol).cast("binary"), 256).as("digest"))
      .agg(min(idCol).as(idCol), count(lit(1)).as("dup_count"))
      .select(idCol, "dup_count")

  /** Documents that survive exact dedup (keep = smallest id per digest). */
  def exactSurvivors(df: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val keep = exact(df, textCol, idCol).select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /**
   * MinHash + LSH near-dup candidate pairs, verified with exact Jaccard.
   *
   * shingle(k words) → H-long MinHash signature (custom Catalyst expression,
   * one pass) → B bands of R rows; docs sharing any band hash are candidates
   * (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3) →
   * verified with exact Jaccard over distinct shingle sets.
   *
   * Scale: the only wide ops are (a) a self-join on (band, bandHash) —
   * bounded buckets once exact dups are removed first, (b) id-keyed joins to
   * fetch shingle sets for the *candidate pairs only*.
   *
   * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
   */
  def minhashLshPairs(df: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", numHashes: Int = 128,
                      bands: Int = 16, shingleWords: Int = 3,
                      threshold: Double = 0.8,
                      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")

    // One scan computes shingle set + signature via codegen'd kernels;
    // persisted because the pipeline consumes it three times (banding +
    // both sides of the candidate verify join) — without this, Spark
    // recomputes the full tokenize/shingle/minhash lineage per consumer.
    // Materialized size is O(docs × (shingles + 8·numHashes)) — the
    // standard LSH-index working set, spillable (MEMORY_AND_DISK). If
    // even the spilled index is too large (extreme corpora), the trade
    // is to persist (id, sig) only and recompute shingles for the
    // candidate ids behind a semi-join — measured ~1 s slower here
    // (extra stages dominate at bench scale), so the cached-index form
    // stays the default.
    val shingled = shingleSig(df, textCol, idCol, numHashes, shingleWords)
      .transform(df => Caching.register(df))

    val cand = bucketPairs(bandKeys(shingled, numHashes, bands),
      Seq("band", "bkey"), maxBucket)

    verifyJaccard(cand, shingled.select(col("id"), col("shingles")), threshold)
  }

  /** One corpus scan → (id, shingles, sig): distinct k-word shingle set +
    * MinHash signature, both codegen kernels. Shared by the in-session
    * pipeline and the persisted-index build/probe paths (which must band
    * identically for incremental results to equal a full run). */
  private def shingleSig(df: DataFrame, textCol: String, idCol: String,
                         numHashes: Int, shingleWords: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      GraftFunctions.shingle_set(
        GraftFunctions.tokens_lc(col(textCol)), shingleWords).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(col("id"), col("shingles"),
        GraftFunctions.minhash_sig(col("shingles"), numHashes).as("sig"))

  /** Band keys from signatures: hash each R-slice of the signature
    * together with the band index; posexplode → one (id, band, bkey) row
    * per band per doc. */
  private def bandKeys(shingled: DataFrame, numHashes: Int,
                       bands: Int): DataFrame = {
    val rows = numHashes / bands
    shingled
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rows + 1, $rows), b))")))
      .toDF("id", "band", "bkey")
  }

  /** Exact-Jaccard verification of candidate pairs: fetch both shingle
    * sets by id (candidates only — never the full corpus squared) and keep
    * pairs at or above `threshold`. */
  private def verifyJaccard(cand: DataFrame, sets: DataFrame,
                            threshold: Double): DataFrame =
    cand
      .join(sets.toDF("id_a", "sh_a"), Seq("id_a"))
      .join(sets.toDF("id_b", "sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /**
   * Build a persisted MinHash/LSH dedup index — the build-once half of
   * the 100 TB operating mode "dedup this week's crawl against the
   * existing corpus". Signatures and band keys for the corpus are
   * computed ONCE and stored; incremental passes
   * ([[minhashLshPairsAgainstIndex]]) then band only the new documents
   * and probe the stored lists instead of re-shingling 100 TB per crawl.
   *
   * Layout under `path` (all parquet):
   *   `params/`   — one row (num_hashes, bands, shingle_words): the probe
   *                 derives its banding from here, so an index can never
   *                 be probed with a mismatched LSH configuration.
   *   `bands/`    — (id, band, bkey), range-partitioned AND sorted by
   *                 (band, bkey) ([[graft.io.Tables.writeSortedBy]]) so
   *                 per-file min/max are disjoint and bucket-key lookups
   *                 skip files.
   *   `shingles/` — (id, shingles), sorted by id: the exact-Jaccard
   *                 verify fetches old-doc shingle sets for candidate ids
   *                 only.
   */
  def buildDedupIndex(df: DataFrame, path: String, textCol: String = "text",
                      idCol: String = "doc_id", numHashes: Int = 128,
                      bands: Int = 32, shingleWords: Int = 3,
                      indexFiles: Int = 32): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((numHashes, bands, shingleWords))
      .toDF("num_hashes", "bands", "shingle_words")
      .repartition(1) // one row — model metadata
      .write.mode("overwrite").parquet(s"$path/params")
    Caching.scoped { // the shared scan is released once both writes land
      val shingled = shingleSig(df, textCol, idCol, numHashes, shingleWords)
        .transform(df => Caching.register(df))
      // fresh-build hygiene: inherit nothing from a previous life of this
      // path (version manifests, tombstones, streaming epoch state)
      graft.io.Tables.resetIndexState(spark, path,
        Seq("shingles", "bands"), clearEpochState = true)
      graft.io.Tables.writeSortedBy(shingled.select("id", "shingles"),
        s"$path/shingles", indexFiles, "id")
      graft.io.Tables.writeSortedBy(bandKeys(shingled, numHashes, bands),
        s"$path/bands", indexFiles, "band", "bkey")
    }
  }

  /**
   * Exact-dedup digest index: the lightweight sibling of
   * [[buildDedupIndex]] for byte-identical dedup only — stores the
   * DISTINCT content digests of the corpus (40-byte rows, digest-sorted
   * parquet for file skipping), no shingles or signatures. Use when the
   * crawl pipeline runs exact dedup as a cheap first pass before the
   * near-dup machinery.
   */
  def buildExactIndex(df: DataFrame, path: String, textCol: String = "text",
                      indexFiles: Int = 32): Unit = {
    graft.io.Tables.resetIndexState(df.sparkSession, path, Seq("digests"))
    graft.io.Tables.writeSortedBy(
      df.select(sha2(col(textCol).cast("binary"), 256).as("digest")).distinct(),
      s"$path/digests", indexFiles, "digest")
  }

  /** Crawl docs that are byte-identical to NOTHING in the indexed corpus,
    * with keep-first (smallest id) inside the crawl. The index side joins
    * on the fixed-width digest — shuffle rows are ~40 bytes regardless of
    * document size, and AQE broadcasts whichever side is small. */
  def exactSurvivorsAgainstIndex(newDocs: DataFrame, path: String,
                                 textCol: String = "text",
                                 idCol: String = "doc_id"): DataFrame = {
    val spark = newDocs.sparkSession
    val withDigest = newDocs.withColumn("__digest",
      sha2(col(textCol).cast("binary"), 256))
    val fresh = withDigest.join(
      digestTombstoneMask(spark, path)(
        spark.read.parquet(comp(spark, s"$path/digests"))),
      col("__digest") === col("digest"), "left_anti")
    val keep = fresh.groupBy("__digest").agg(min(idCol).as(idCol))
      .select(idCol)
    fresh.join(keep, Seq(idCol), "left_semi").drop("__digest")
  }

  /** Append the crawl's survivor digests to an exact-dedup index
    * (LSM-style sorted append, like [[appendToDedupIndex]]). */
  def appendToExactIndex(df: DataFrame, path: String,
                         textCol: String = "text",
                         indexFiles: Int = 4): Unit =
    exactDigestDelta(df, textCol, indexFiles)
      .write.mode("append")
      .parquet(comp(df.sparkSession, s"$path/digests"))

  private def exactDigestDelta(df: DataFrame, textCol: String,
                               indexFiles: Int): DataFrame =
    df.select(sha2(col(textCol).cast("binary"), 256).as("digest")).distinct()
      .repartitionByRange(indexFiles, col("digest"))
      .sortWithinPartitions("digest")

  /** Epoch-idempotent [[appendToExactIndex]] ([[graft.io.EpochCommit]]
    * over the `digests` component) — with this, every persisted index
    * family (MinHash dedup, IVF ANN, exact-digest) offers exactly-once
    * appends from a streaming `foreachBatch`. Probing callers run
    * [[cleanPartialExactEpoch]] before the probe, same contract as the
    * other families (a half-promoted replay would otherwise match its
    * own digests and drop the batch as a duplicate of itself).
    * @return true if appended, false on a committed-epoch replay. */
  def appendToExactIndexEpoch(df: DataFrame, path: String, epochId: Long,
                              queryId: String = "stream",
                              textCol: String = "text",
                              indexFiles: Int = 4): Boolean =
    graft.io.EpochCommit.append(df.sparkSession, path, Seq("digests"),
      epochId, queryId) { staging =>
      exactDigestDelta(df, textCol, indexFiles)
        .write.mode("overwrite").parquet(s"$staging/digests")
    }

  /** [[graft.io.EpochCommit.cleanPartial]] over the exact index's
    * `digests` component. */
  def cleanPartialExactEpoch(spark: org.apache.spark.sql.SparkSession,
                             path: String, epochId: Long,
                             queryId: String = "stream"): Unit =
    graft.io.EpochCommit.cleanPartial(spark, path, Seq("digests"),
      epochId, queryId)

  /**
   * Append already-deduped documents to a persisted dedup index — the
   * maintenance half of the weekly-crawl loop: probe the crawl with
   * [[minhashLshPairsAgainstIndex]], drop the duplicates, then append the
   * survivors here so the NEXT crawl dedups against them too. Signatures
   * are computed once from the index's own `params/` (an append can never
   * band inconsistently) and written as new range-sorted parquet files
   * under the same layout. File key ranges are disjoint within one append
   * but overlap across appends (LSM-style); if probe-side file skipping
   * degrades after many small appends, compact with
   * [[graft.io.Tables.compact]].
   *
   * Contract: `df` ids must be disjoint from ids already in the index.
   */
  def appendToDedupIndex(df: DataFrame, path: String,
                         textCol: String = "text", idCol: String = "doc_id",
                         indexFiles: Int = 4): Unit =
    writeIndexDelta(df, path, path, textCol, idCol, indexFiles,
      org.apache.spark.sql.SaveMode.Append)

  /** Shared delta-writer for plain and epoch-idempotent appends: sign+band
    * `df` under the index's own `params/` and write both components to
    * `outRoot` as range-sorted files. */
  private def writeIndexDelta(df: DataFrame, indexRoot: String,
                              outRoot: String, textCol: String, idCol: String,
                              indexFiles: Int,
                              mode: org.apache.spark.sql.SaveMode): Unit = {
    val spark = df.sparkSession
    val p = spark.read.parquet(s"$indexRoot/params").collect()(0) // one row
    val (numHashes, bands, shingleWords) =
      (p.getInt(0), p.getInt(1), p.getInt(2))
    Caching.scoped { // the shared scan releases once both appends land
      val shingled = shingleSig(df, textCol, idCol, numHashes, shingleWords)
        .transform(df => Caching.register(df))
      shingled.select("id", "shingles")
        .repartitionByRange(indexFiles, col("id"))
        .sortWithinPartitions("id")
        .write.mode(mode).parquet(comp(spark, s"$outRoot/shingles"))
      bandKeys(shingled, numHashes, bands)
        .repartitionByRange(indexFiles, col("band"), col("bkey"))
        .sortWithinPartitions("band", "bkey")
        .write.mode(mode).parquet(comp(spark, s"$outRoot/bands"))
    }
  }

  /** Remove the PARTIALLY-promoted files of an uncommitted epoch (crash
    * between promote and marker). Callers that PROBE the index before an
    * epoch-idempotent append — the streaming dedup loop — must run this
    * BEFORE the probe: the partial files carry the replayed batch's own
    * ids, and probing across them would flag the batch as a duplicate of
    * itself and drop it from the index permanently
    * ([[graft.io.EpochCommit.cleanPartial]] over this index's
    * components). */
  def cleanPartialEpoch(spark: org.apache.spark.sql.SparkSession,
                        path: String, epochId: Long,
                        queryId: String = "stream"): Unit =
    graft.io.EpochCommit.cleanPartial(spark, path, dedupComponents,
      epochId, queryId)

  /** True iff `epochId` of `queryId` has already been committed into the
    * index at `path` by [[appendToDedupIndexEpoch]]. */
  def epochCommitted(spark: org.apache.spark.sql.SparkSession, path: String,
                     queryId: String, epochId: Long): Boolean =
    graft.io.EpochCommit.committed(spark, path, queryId, epochId)

  private val dedupComponents = Seq("shingles", "bands")

  /**
   * Epoch-idempotent [[appendToDedupIndex]]: the
   * [[graft.io.EpochCommit]] stage → promote → marker protocol over this
   * index's `shingles`/`bands` components, for exactly-once index
   * maintenance from a Structured Streaming `foreachBatch` (the engine
   * replays the last uncommitted micro-batch after a crash; a plain
   * append would then double the batch's signatures, and every later
   * probe of those ids would report them as duplicates of themselves —
   * see EpochCommit's scaladoc for the crash-case walk-through).
   *
   * @return true if this call performed the append, false if the epoch
   *         was already committed (replay detected).
   */
  def appendToDedupIndexEpoch(df: DataFrame, path: String, epochId: Long,
                              queryId: String = "stream",
                              textCol: String = "text",
                              idCol: String = "doc_id",
                              indexFiles: Int = 4): Boolean =
    graft.io.EpochCommit.append(df.sparkSession, path, dedupComponents,
      epochId, queryId) { staging =>
      writeIndexDelta(df, path, staging, textCol, idCol, indexFiles,
        org.apache.spark.sql.SaveMode.Overwrite)
    }

  /**
   * LSM maintenance trigger: compact the index iff either component has
   * accumulated more than `maxFilesPerComponent` parquet files (the
   * file-count proxy for cross-append key-range overlap — each append
   * adds ≤ `indexFiles` files whose ranges overlap all earlier ones, so
   * file count tracks both listing pressure and lost file-skipping).
   * Cheap when below threshold: one listing per component, no data pass.
   *
   * @return true if a compaction ran.
   */
  def maybeCompactDedupIndex(spark: org.apache.spark.sql.SparkSession,
                             path: String, maxFilesPerComponent: Int = 64,
                             indexFiles: Int = 32): Boolean = {
    val over = Seq("shingles", "bands").exists(sub =>
      graft.io.Tables.parquetFileCount(spark, s"$path/$sub")
        > maxFilesPerComponent)
    if (over) compactDedupIndex(spark, path, indexFiles)
    over
  }

  /**
   * Re-sort an appended dedup index back into globally disjoint per-file
   * key ranges. Appends are LSM-style — each batch's files are sorted but
   * ranges overlap ACROSS batches, so probe-side file skipping degrades
   * as appends accumulate; compaction rewrites each component as one
   * fresh sorted run (read → range-sort → atomic directory swap).
   * Results are unchanged when no tombstones are pending (ExtSpec pins
   * probe equality); pending [[deleteFromDedupIndex]] tombstones are
   * applied physically here and the sidecar cleared. Run it when append
   * count grows, like any LSM maintenance job.
   *
   * Safe against a crashed streaming append: `ep-<query>-<epoch>-*` files
   * whose epoch has NO committed marker (a crash between promote and
   * marker) are EXCLUDED from the rewrite instead of being folded in under
   * fresh names — folding them would strand the replay's
   * [[cleanPartialEpoch]] (which looks for the epoch prefix), make the
   * probe flag the replayed batch as a duplicate of itself, and drop the
   * batch from the index permanently. Excluded files stay behind in the
   * previous version directory, the replay re-appends the full batch into
   * the new version, and the orphans are garbage-collected by version
   * retention — a compaction racing a downed stream now converges instead
   * of corrupting.
   */
  def compactDedupIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, indexFiles: Int = 32): Unit = {
    val mask = tombstoneMask(spark, path)
    val dropPartial =
      graft.io.EpochCommit.dropUncommitted(spark, path, dedupComponents)
    // the two components are independent datasets with independent
    // version manifests — rewrite them as CONCURRENT Spark jobs (the
    // scheduler interleaves their stages across the executor pool, so
    // the shuffle of one overlaps the write of the other; ~25% off the
    // maintenance wall-clock at sf0.1, identical results)
    graft.io.Fs.inParallel(
      Seq("bands" -> Seq("band", "bkey"), "shingles" -> Seq("id"))) {
      case (sub, cols) =>
        graft.io.Tables.compactSorted(spark, s"$path/$sub", indexFiles,
          dedupe = false, cols: _*)(df => mask(dropPartial(df)))
    }
    clearTombstones(spark, path)
  }

  /**
   * Takedown/opt-out support — delete documents from a persisted dedup
   * index WITHOUT a rebuild: ids land in a `tombstones/` sidecar (append,
   * tiny), every probe masks the stored bands and shingle sets against it
   * (broadcast anti-join — the tombstone set is takedown-sized, orders of
   * magnitude below the corpus), and the next [[compactDedupIndex]]
   * applies the deletions PHYSICALLY (rewrites the components without the
   * ids) and clears the sidecar. Snapshot semantics for concurrent
   * readers: a probe that resolved its component version before the
   * compaction simply sees the pre-delete snapshot, same one-cycle grace
   * as every versioned swap. Deleted ids must never be REUSED for new
   * documents (the index id contract is append-only-unique).
   *
   * Tombstones are written in the STORED id type (read from the shingles
   * component's footer) — an anti-join between mismatched key types
   * silently matches nothing, which would make deletions a no-op on an
   * index whose ids were not longs at build time.
   */
  def deleteFromDedupIndex(ids: DataFrame, path: String,
                           idCol: String = "doc_id"): Unit = {
    val idType = graft.io.Tables
      .storedColumnType(ids.sparkSession, s"$path/shingles", "id")
      .getOrElse(org.apache.spark.sql.types.LongType)
    ids.select(col(idCol).cast(idType).as("id")).distinct()
      .coalesce(1).write.mode("append").parquet(s"$path/tombstones")
  }

  private def tombstoneMask(spark: org.apache.spark.sql.SparkSession,
                            path: String): DataFrame => DataFrame =
    graft.io.Tables.tombstoneMask(spark, path, "id")

  private def clearTombstones(spark: org.apache.spark.sql.SparkSession,
                              path: String): Unit =
    graft.io.Tables.clearTombstones(spark, path)

  /** Compact an exact-digest index: restore disjoint per-file digest
    * ranges and drop duplicate digests accumulated across appends;
    * pending [[deleteFromExactIndex]] tombstones are applied physically
    * and the sidecar cleared. */
  def compactExactIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, indexFiles: Int = 32): Unit = {
    val mask = digestTombstoneMask(spark, path)
    // exclude partial promotes of a downed stream (see
    // EpochCommit.dropUncommitted) — same contract as the other families
    val dropPartial =
      graft.io.EpochCommit.dropUncommitted(spark, path, Seq("digests"))
    graft.io.Tables.compactSorted(spark, s"$path/digests", indexFiles,
      dedupe = true, "digest")(df => mask(dropPartial(df)))
    clearTombstones(spark, path)
  }

  /** Takedown for the exact-digest index — keyed by CONTENT, not id (the
    * index stores only digests): removing a document's digest means a
    * future identical document is no longer treated as a duplicate — it
    * becomes the new canonical copy, which is the correct takedown
    * semantics. Probes mask the stored digests until the next
    * [[compactExactIndex]] applies the removal physically. */
  def deleteFromExactIndex(docs: DataFrame, path: String,
                           textCol: String = "text"): Unit =
    docs.select(sha2(col(textCol).cast("binary"), 256).as("digest"))
      .distinct()
      .coalesce(1).write.mode("append").parquet(s"$path/tombstones")

  private def digestTombstoneMask(spark: org.apache.spark.sql.SparkSession,
                                  path: String): DataFrame => DataFrame =
    graft.io.Tables.tombstoneMask(spark, path, "digest")

  /**
   * Incremental MinHash/LSH near-dup pairs: all pairs (id_a, id_b, jaccard)
   * that INVOLVE at least one document of `newDocs`, against a corpus
   * indexed by [[buildDedupIndex]]. Equivalent to running
   * [[minhashLshPairs]] over (indexed corpus ∪ newDocs) and keeping the
   * pairs touching a new doc — without re-shingling the corpus (ExtSpec
   * pins the equivalence as a property, including under the bucket cap:
   * both paths keep the same `maxBucket` smallest ids per bucket).
   *
   * Plan shape, scan-of-new-docs-sized where possible:
   *  1. shingle+sign the NEW docs only (one scan, shared by banding and
   *     verification);
   *  2. semi-join the stored band lists to the new docs' distinct band
   *     keys — buckets no new doc touches never leave the parquet scan,
   *     and AQE broadcasts the key set when the crawl is small relative
   *     to the corpus;
   *  3. enumerate candidate pairs inside the touched buckets with the
   *     same capped [[bucketPairs]] as the full run, drop pairs where
   *     both sides are old;
   *  4. verify with exact Jaccard — new-doc shingles from the in-session
   *     scan, old-doc shingles fetched from `shingles/` for candidate ids
   *     only.
   *
   * Contract: `newDocs` ids must be disjoint from the indexed corpus ids
   * (an id on both sides would double its shingle rows in the verify
   * join). LSH parameters come from the index's `params/`, so the caller
   * cannot band inconsistently.
   */
  def minhashLshPairsAgainstIndex(newDocs: DataFrame, path: String,
                                  textCol: String = "text",
                                  idCol: String = "doc_id",
                                  threshold: Double = 0.8,
                                  maxBucket: Int = 1000): DataFrame = {
    val spark = newDocs.sparkSession
    val p = spark.read.parquet(s"$path/params").collect()(0) // one row
    val (numHashes, bands, shingleWords) =
      (p.getInt(0), p.getInt(1), p.getInt(2))

    val shingledNew =
      shingleSig(newDocs, textCol, idCol, numHashes, shingleWords)
        .transform(df => Caching.register(df))
    val bandedNew = bandKeys(shingledNew, numHashes, bands)

    val mask = tombstoneMask(spark, path)
    val touched = mask(spark.read.parquet(comp(spark, s"$path/bands")))
      .join(bandedNew.select("band", "bkey").distinct(),
        Seq("band", "bkey"), "left_semi")

    val cand = bucketPairs(touched.unionByName(bandedNew),
      Seq("band", "bkey"), maxBucket)

    // keep pairs touching a new id (old-old pairs inside a shared bucket
    // are not this pass's job — the corpus was deduped when indexed)
    val newIds = shingledNew.select(col("id"))
    val candNew = cand
      .join(newIds.select(col("id").as("id_a"), lit(true).as("is_new_a")),
        Seq("id_a"), "left")
      .join(newIds.select(col("id").as("id_b"), lit(true).as("is_new_b")),
        Seq("id_b"), "left")
      .filter(col("is_new_a").isNotNull || col("is_new_b").isNotNull)
      .select("id_a", "id_b")

    val sets = shingledNew.select(col("id"), col("shingles"))
      .unionByName(mask(spark.read.parquet(comp(spark, s"$path/shingles"))))
    verifyJaccard(candNew, sets, threshold)
  }

  /** Crawl docs to DROP given the incremental pair set: a new doc drops if
    * it pairs with an indexed doc (the index member was there first) or
    * with a smaller-id doc of the same crawl (keep-first tie-break).
    * `ids` = the crawl's ids. Shared by the batch survivors helper and the
    * streaming incremental loop. */
  private[graft] def incrementalDropIds(pairs: DataFrame, ids: DataFrame,
                                        idCol: String): DataFrame =
    pairs
      .join(ids.select(col(idCol).as("id_a"), lit(true).as("new_a")),
        Seq("id_a"), "left")
      .join(ids.select(col(idCol).as("id_b"), lit(true).as("new_b")),
        Seq("id_b"), "left")
      .select(when(col("new_a").isNotNull && col("new_b").isNotNull, col("id_b"))
        .when(col("new_a").isNotNull, col("id_a")) // new-old: the new side drops
        .otherwise(col("id_b")).as(idCol))
      .distinct()

  /** Incremental survivors: the crawl minus its near-duplicates (of the
    * indexed corpus, or keep-first within the crawl). Pair generation and
    * verification as in [[minhashLshPairsAgainstIndex]]. Typically
    * followed by [[appendToDedupIndex]] on the result. */
  def minhashLshSurvivorsAgainstIndex(newDocs: DataFrame, path: String,
                                      textCol: String = "text",
                                      idCol: String = "doc_id",
                                      threshold: Double = 0.8,
                                      maxBucket: Int = 1000): DataFrame = {
    val pairs = minhashLshPairsAgainstIndex(newDocs, path, textCol, idCol,
      threshold, maxBucket)
    val drops = incrementalDropIds(pairs, newDocs.select(col(idCol)), idCol)
    newDocs.join(drops, Seq(idCol), "left_anti")
  }

  /** Near-dedup survivors: drop any doc that has a similar doc with a
    * smaller id (standard keep-first policy). */
  def minhashLshSurvivors(df: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id", numHashes: Int = 128,
                          bands: Int = 16, shingleWords: Int = 3,
                          threshold: Double = 0.8): DataFrame = {
    val drops = minhashLshPairs(df, textCol, idCol, numHashes, bands,
      shingleWords, threshold).select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /**
   * Connected components over a dup-pair edge list → (doc_id, cluster_id)
   * where cluster_id is the smallest doc id reachable through the pair
   * graph (singletons are their own cluster). This is the principled
   * bridge from dup PAIRS to cluster representatives: similarity is not
   * transitive, so near-dup groups must be closed before electing one
   * survivor per group.
   *
   * Algorithm: min-label propagation with per-round pointer halving
   * (each round also replaces a node's label with its label's label) —
   * the halving step is what turns O(diameter) convergence into
   * O(log diameter), the standard hash-to-min / Union-Find-contraction
   * trade (cf. Kiveris et al., "Connected Components in MapReduce and
   * Beyond", SoCC 2014). Every round shuffles only fixed-width
   * (id, label) rows; iteration stops at the fixpoint (count of changed
   * labels, one action per round) or `maxIters`.
   *
   * @param checkpointDir when set, per-round lineage truncation uses
   *        RELIABLE `checkpoint` into this directory (any Hadoop URI)
   *        instead of `localCheckpoint`. localCheckpoint stores the
   *        truncated partitions on executors — on a real cluster, losing
   *        ONE executor mid-loop kills the whole job because the lineage
   *        needed to recompute them is gone. A reliable checkpoint
   *        survives executor loss at the cost of a per-round
   *        write-to-storage; at 100 TB that is the correct trade for a
   *        multi-round iterative job.
   *
   *        Storage stays BOUNDED: once round N's checkpoint and fixpoint
   *        check have materialized, round N-1's checkpoint files are
   *        deleted — at most two label-table copies exist at any moment
   *        (not one per round, which at 100 TB would grow storage by a
   *        full label table per iteration). The FINAL round's files are
   *        intentionally kept: the returned DataFrame reads from them —
   *        remove the directory after consuming the result. Cleanup is
   *        scoped to this SparkContext's own UUID subdirectory
   *        (`sc.getCheckpointDir`), so a shared parent directory is safe.
   *
   *        Side effect to know about: `setCheckpointDir` is GLOBAL
   *        SparkContext state — other jobs in the same session that call
   *        `.checkpoint()` afterwards will also write under this
   *        directory (in the same per-context UUID subdir).
   */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          idCol: String = "doc_id",
                          maxIters: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    val ck = new RoundCheckpointer(nodes.sparkSession.sparkContext,
      checkpointDir)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .transform(df => Caching.register(df))
    // checkpoint (NOT persist) per iteration — see RoundCheckpointer for
    // why lineage must truncate and how storage stays ≤ 2 label tables
    var labels = ck.snap(nodes.select(col(idCol).as("v"), col(idCol).as("lbl")))
    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("v").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst").as("v")).agg(min("lbl").as("nlbl"))
      val stepped = labels.join(nbrMin, Seq("v"), "left")
        .select(col("v"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val halved = stepped
        .join(stepped.select(col("v").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"), "left")
        .select(col("v"),
          least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl"))
      val snapped = ck.snap(halved)
      val changed = snapped
        .join(labels.withColumnRenamed("lbl", "old"), Seq("v"))
        .filter(col("lbl") =!= col("old")).count()
      // the fixpoint check above was the LAST reader of round N-1's
      // labels — its checkpoint files can go now
      ck.releasePrevious()
      labels = snapped
      done = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("v").as(idCol), col("lbl").as("cluster_id"))
  }

  /**
   * SimHash near-dup pairs: 64-bit SimHash per doc; block on the four
   * 16-bit quarters (two docs within Hamming distance 3 must agree on at
   * least one quarter — pigeonhole); verify `bit_count(a^b) <= maxHamming`.
   */
  def simhashPairs(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    // persisted: both sides of the blocked self-join derive from it
    val fp = df.select(
      col(idCol).as("id"),
      GraftFunctions.simhash64(GraftFunctions.tokens_lc(col(textCol))).as("fp"))
      .transform(df => Caching.register(df))

    val blocked = fp.select(col("id"), posexplode(expr(
      "transform(sequence(0, 3), q -> (fp >> (q * 16)) & 65535)")))
      .toDF("id", "q", "qkey")

    bucketPairs(blocked, Seq("q", "qkey"))
      .join(fp.toDF("id_a", "fp_a"), Seq("id_a"))
      .join(fp.toDF("id_b", "fp_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(fp_a ^ fp_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Exact n-gram Jaccard similarity via a distributed inverted index:
   * explode distinct shingles → group postings per shingle (df-cut drops
   * postings longer than dfCut) → enumerate in-posting pairs → count
   * co-occurrences → jaccard.
   */
  def ngramJaccardPairs(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", shingleWords: Int = 3,
                        threshold: Double = 0.5, dfCut: Int = 1000): DataFrame = {
    val (co, sizes) = ngramSharedCounts(df, textCol, idCol, shingleWords, dfCut)
    co.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /**
   * Directional overlap scored symmetrically: `shared / min(|A|, |B|)` —
   * 1.0 whenever one document's shingle set CONTAINS the other's, no
   * matter how much longer the container is. This is the wrapper/quote
   * detector Jaccard structurally cannot be: a short document embedded
   * verbatim in a long one has Jaccard ≈ |short| / |long| (arbitrarily
   * small) but containment 1.0. Same inverted-index + df-cut machinery
   * and the same candidate contract as [[ngramJaccardPairs]].
   */
  def ngramContainmentPairs(df: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id", shingleWords: Int = 3,
                            threshold: Double = 0.9,
                            dfCut: Int = 1000): DataFrame = {
    val (co, sizes) = ngramSharedCounts(df, textCol, idCol, shingleWords, dfCut)
    co.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Shared inverted-index core of the n-gram pair scorers: exact
    * per-pair shared-shingle counts (map-side-bounded df-cut, see the
    * inline notes) plus per-doc set sizes. */
  private def ngramSharedCounts(df: DataFrame, textCol: String,
                                idCol: String, shingleWords: Int,
                                dfCut: Int): (DataFrame, DataFrame) = {
    // kernel-computed shingle sets, persisted: consumed by the posting
    // list and by both size-lookup joins.
    val shingled = df.select(
      col(idCol).as("id"),
      GraftFunctions.shingle_set(
        GraftFunctions.tokens_lc(col(textCol)), shingleWords).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .transform(df => Caching.register(df))

    val sizes = shingled.select(col("id"), size(col("shingles")).as("n"))

    // inverted index grouped per shingle: one shuffle of the posting list.
    // The df-cut falls out of the same groupBy — postings longer than
    // dfCut are ultra-common shingles that add little Jaccard mass but
    // quadratic pair fan-out, so they are skipped entirely. The bounded
    // aggregate makes the cut map-side: at most dfCut ids per shingle
    // buffer anywhere, and the EXACT total drives the cut, so a kept
    // posting list (total <= dfCut) is always complete — semantics are
    // identical to collect_list + length filter, without the hot-shingle
    // task buffer.
    import graft.functions.BoundedMinIds.bounded_min_ids
    val posts = shingled.select(col("id"), explode(col("shingles")).as("sh"))
    val co = posts
      .groupBy("sh").agg(bounded_min_ids(col("id"), dfCut).as("bk"))
      .filter(col("bk.total").between(2, dfCut))
      .select(col("bk.ids").as("ids"))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS id_a, y AS id_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("shared"))

    (co, sizes)
  }

  /**
   * Embedding-cosine near-dup pairs. Blocking: sign-bit LSH (random
   * hyperplanes ≈ SRP-LSH, Charikar 2002) — here the hyperplanes are the
   * coordinate axes of a seeded pseudo-rotation: bucket = sign bits of 16
   * seeded linear combinations, split into 4 bands of 4 bits. Verified with
   * exact cosine. Brute-force variant below for small inputs / oracles.
   */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            threshold: Double = 0.95): DataFrame = {
    // 16 SRP sign bits (codegen kernel), split into 4 bands of 4 bits.
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      GraftFunctions.srp_sign(col(vecCol), 16).as("srp"))
      .transform(df => Caching.register(df)) // both join sides derive from it

    // bucket ids only — vectors are joined back for the (few) candidate
    // pairs rather than shuffled once per band.
    val blocked = sig.select(col("id"), posexplode(expr(
      "transform(sequence(0, 3), q -> (srp >> (q * 4)) & 15)")))
      .toDF("id", "q", "qkey")

    val vecs = sig.select(col("id"), col("v"))
    bucketPairs(blocked, Seq("q", "qkey"))
      .join(vecs.toDF("id_a", "v_a"), Seq("id_a"))
      .join(vecs.toDF("id_b", "v_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        GraftFunctions.cosine_sim(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Brute-force embedding near-dup (O(n²) — small n / oracle checks only). */
  def embeddingNearDupBrute(emb: DataFrame, idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            threshold: Double = 0.95): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        GraftFunctions.cosine_sim(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
