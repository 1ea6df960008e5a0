package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine_sim
import graft.functions.TopKByScore.top_k_by

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (extension layer, SURVEY.md §7.3).
 *
 * Scale design: the query set is broadcast (it is the small side by
 * construction); the corpus is scanned once; per-group top-k uses the
 * bounded-heap `TopKByScore` aggregate, so partial aggregation keeps at
 * most k candidates per partition per query and only O(k) rows cross the
 * shuffle — never `collect_list` of the whole corpus.
 */
object Similarity {

  /** Exact brute-force cosine top-k: one corpus scan per query batch.
    * Output: (query_id, neighbor_id, score) — k rows per query,
    * self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
    c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosine_sim(col("q_vec"), col("c_vec")).as("score"))
      .groupBy("query_id")
      .agg(top_k_by(col("score"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"))
  }

  /**
   * IVF-style ANN: partition the corpus into Voronoi cells of a coarse
   * quantizer (IVF-Flat, cf. Jégou et al., "Product Quantization for
   * Nearest Neighbor Search", TPAMI 2011 — inverted-list part only, no PQ
   * compression); queries probe the `nprobe` nearest cells.
   *
   * The coarse quantizer is model state: a FIXED number of centroids
   * (`numCentroids`, default 256) chosen as a deterministic hash-ordered
   * sample of the corpus — a distributed TakeOrdered, so the driver
   * receives exactly `numCentroids` rows no matter how large the corpus
   * is (a stride sample would grow the driver collect linearly with
   * corpus size — a driver OOM at 100 TB). At real scale the quantizer
   * would be k-means trained offline; hash-ordered sampling keeps the
   * same contract (bounded, deterministic, parallelism-independent).
   * The centroid matrix is metadata-sized, so it is collected once and
   * baked into a [[graft.functions.NearestCentroids]] codegen expression —
   * cell assignment is then a pure projection over the corpus scan (no
   * join, no shuffle of vectors), the probe side broadcasts (queries are
   * the small side by construction), and only O(k) rows per query cross
   * the final shuffle via the bounded top-k aggregate.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 256, nprobe: Int = 4,
              kmeansIters: Int = 2, sampleFactor: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.GraftFunctions.nearest_centroids
    val (cents, dim) = trainQuantizer(corpus, numCentroids, kmeansIters,
      sampleFactor, idCol, vecCol)
    val assigned = corpus
      .select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"),
        nearest_centroids(col(vecCol), cents, dim, 1).getItem(0).as("bucket"))
    probeIndex(assigned, cents, dim, queries, k, nprobe, idCol, vecCol)
  }

  /** Coarse-quantizer training, shared by the in-session and persisted
    * index paths. Returns the flattened (numCentroids × dim) centroid
    * matrix + dim — metadata-sized model state. */
  private def trainQuantizer(corpus: DataFrame, numCentroids: Int,
                             kmeansIters: Int, sampleFactor: Int,
                             idCol: String, vecCol: String): (Array[Float], Int) = {
    import graft.functions.GraftFunctions.nearest_centroids
    // quantizer init = bounded model state: exactly numCentroids vectors
    val centRows = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(numCentroids)
      .collect()
    require(centRows.nonEmpty, "corpus is empty — no centroids")
    val dim = centRows.head.getSeq[Float](1).length
    var cents = new Array[Float](centRows.length * dim)
    centRows.zipWithIndex.foreach { case (r, i) =>
      val v = r.getSeq[Float](1)
      var j = 0
      while (j < dim) { cents(i * dim + j) = v(j); j += 1 }
    }

    // Lloyd refinement (spherical k-means: cosine assignment, per-cell
    // mean) on a BOUNDED hash-ordered sample — training cost and every
    // driver transfer are independent of corpus size: the sample is
    // `numCentroids * sampleFactor` rows that stay distributed; only the
    // (cells × dim) mean matrix comes back per iteration.
    if (kmeansIters > 0) {
      val sample = corpus
        .select(col(idCol), col(vecCol))
        .orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(math.max(numCentroids * sampleFactor, numCentroids))
        .cache()
      try {
        for (_ <- 1 to kmeansIters) {
          val means = sample
            .select(nearest_centroids(col(vecCol), cents, dim, 1)
              .getItem(0).as("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
            // fixed-point mean, NOT avg(double): float summation order
            // varies with partitioning/scheduling run to run, and a
            // last-bit centroid difference flips boundary assignments —
            // at large SF that surfaced as recall verdicts flapping
            // around their gate. Integer sums are order-independent, so
            // training is bit-deterministic; 1e-7 quantization is far
            // below k-means' own convergence tolerance.
            .groupBy("cell", "pos")
            .agg((sum(round(col("x") * 1e7).cast("long")).cast("double") /
              count(lit(1)) / 1e7).as("m"))
            .collect() // ≤ numCentroids × dim rows — metadata-sized
          val next = cents.clone() // empty cells keep their old centroid
          means.foreach { r =>
            next(r.getInt(0) * dim + r.getInt(1)) = r.getDouble(2).toFloat
          }
          cents = next
        }
      } finally sample.unpersist()
    }
    (cents, dim)
  }

  /** Shared probe tail: search only the probed cells — probes broadcast
    * (queries are the small side), the inverted lists stream. */
  private def probeIndex(assigned: DataFrame, cents: Array[Float], dim: Int,
                         queries: DataFrame, k: Int, nprobe: Int,
                         idCol: String, vecCol: String): DataFrame = {
    import graft.functions.GraftFunctions.nearest_centroids
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        explode(nearest_centroids(col(vecCol), cents, dim, nprobe)).as("bucket"))
    assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosine_sim(col("q_vec"), col("c_vec")).as("score"))
      .groupBy("query_id")
      .agg(top_k_by(col("score"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"))
  }

  /**
   * Persisted IVF index — the build-once/query-many split a 100 TB corpus
   * requires: quantizer training + the full corpus-assignment scan run
   * ONCE, then any number of query batches probe the stored inverted
   * lists. Layout under `path`:
   *   `centroids/`   — (cell, centroid) parquet, numCentroids rows
   *   `assignments/` — (bucket, cand_id, c_vec) parquet, range-partitioned
   *                    AND sorted by bucket ([[graft.io.Tables.writeSortedBy]]),
   *                    so per-file bucket min/max are disjoint and a probe
   *                    of `nprobe` cells skips every other file.
   */
  def buildIvfIndex(corpus: DataFrame, path: String,
                    numCentroids: Int = 256, kmeansIters: Int = 2,
                    sampleFactor: Int = 64, indexFiles: Int = 32,
                    idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import graft.functions.GraftFunctions.nearest_centroids
    val spark = corpus.sparkSession
    val (cents, dim) = trainQuantizer(corpus, numCentroids, kmeansIters,
      sampleFactor, idCol, vecCol)
    val centroidRows = (0 until cents.length / dim).map { c =>
      (c, cents.slice(c * dim, (c + 1) * dim).toSeq)
    }
    import spark.implicits._
    centroidRows.toDF("cell", "centroid")
      .repartition(1) // metadata-sized
      .write.mode("overwrite").parquet(s"$path/centroids")
    val assigned = corpus
      .select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"),
        nearest_centroids(col(vecCol), cents, dim, 1).getItem(0).as("bucket"))
    graft.io.Tables.resetIndexState(spark, path, Seq("assignments"))
    graft.io.Tables.writeSortedBy(assigned, s"$path/assignments",
      indexFiles, "bucket")
  }

  /** Load the metadata-sized centroid matrix of a persisted index. */
  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       path: String): (Array[Float], Int) = {
    val rows = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect() // numCentroids rows — metadata-sized
    require(rows.nonEmpty, s"no centroids at $path/centroids")
    val dim = rows.head.getSeq[Float](1).length
    val cents = new Array[Float](rows.length * dim)
    rows.foreach { r =>
      val c = r.getInt(0)
      val v = r.getSeq[Float](1)
      var j = 0
      while (j < dim) { cents(c * dim + j) = v(j); j += 1 }
    }
    (cents, dim)
  }

  /**
   * Semantic eval-set decontamination: drop every corpus vector whose
   * cosine to ANY held-out vector reaches `threshold`. The held-out side
   * is an eval set — small by construction — so it broadcasts and the
   * corpus is read in ONE scan with a codegen cosine per (row, held)
   * pair; no shuffle of corpus vectors, no LSH recall loss (exact). For
   * a held-out side too large to broadcast, block both sides with
   * [[Dedup.embeddingNearDupPairs]]-style SRP bands instead and accept
   * the measured recall.
   *
   * Returns the SURVIVING corpus rows (all columns).
   */
  def semanticDecontaminate(corpus: DataFrame, heldOut: DataFrame,
                            threshold: Double,
                            vecCol: String = "embedding"): DataFrame = {
    val h = heldOut.select(col(vecCol).as("__h_vec"))
    corpus.join(broadcast(h),
      cosine_sim(col(vecCol), col("__h_vec")) >= threshold, "left_anti")
  }

  /** Append new vectors to a persisted IVF index: assign cells with the
    * STORED quantizer (centroids are model state — appends never retrain,
    * so existing assignments stay valid) and add bucket-sorted
    * inverted-list files. Like the dedup index, file bucket ranges are
    * disjoint per append and overlap across appends (LSM-style); rebuild
    * when quantizer drift matters, compact when file skipping degrades.
    * Contract: new ids are disjoint from ids already in the index. */
  def appendToIvfIndex(newVecs: DataFrame, path: String, indexFiles: Int = 4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit =
    assignmentDelta(newVecs, path, indexFiles, idCol, vecCol)
      .write.mode("append").parquet(
        graft.io.Tables.resolveComponent(newVecs.sparkSession,
          s"$path/assignments"))

  /** Shared delta for plain and epoch-idempotent IVF appends: assign
    * cells with the STORED quantizer, bucket-range-partitioned and
    * bucket-sorted like the index layout. */
  private def assignmentDelta(newVecs: DataFrame, path: String,
                              indexFiles: Int, idCol: String,
                              vecCol: String): DataFrame = {
    import graft.functions.GraftFunctions.nearest_centroids
    val (cents, dim) = loadIvfCentroids(newVecs.sparkSession, path)
    newVecs
      .select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"),
        nearest_centroids(col(vecCol), cents, dim, 1).getItem(0).as("bucket"))
      .repartitionByRange(indexFiles, col("bucket"))
      .sortWithinPartitions("bucket")
  }

  /** Components an ANN path may carry ("assignments" IVF inverted lists
    * and/or "codes" PQ lists) — the epoch and compaction machinery walks
    * whichever are live. */
  private val annComponents = Seq("assignments", "codes")

  /**
   * Epoch-idempotent [[appendToIvfIndex]]: the [[graft.io.EpochCommit]]
   * stage → promote → marker protocol over the `assignments` component,
   * for exactly-once index growth from a Structured Streaming
   * `foreachBatch` — the embedding-store twin of
   * [[graft.ext.Dedup.appendToDedupIndexEpoch]]. A crash-replayed
   * micro-batch is detected by its committed marker and skipped
   * wholesale; a crash between promote and marker is cleaned up and
   * re-staged on replay (probing callers must run
   * [[cleanPartialAnnEpoch]] BEFORE their probe, or the replayed batch
   * matches its own half-landed vectors and is dropped as a near-dup of
   * itself).
   *
   * @return true if this call performed the append, false if the epoch
   *         was already committed (replay detected).
   */
  def appendToIvfIndexEpoch(newVecs: DataFrame, path: String, epochId: Long,
                            queryId: String = "stream",
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            indexFiles: Int = 4): Boolean =
    graft.io.EpochCommit.append(newVecs.sparkSession, path,
      Seq("assignments"), epochId, queryId) { staging =>
      assignmentDelta(newVecs, path, indexFiles, idCol, vecCol)
        .write.mode("overwrite").parquet(s"$staging/assignments")
    }

  /** [[graft.io.EpochCommit.cleanPartial]] over the ANN components —
    * run BEFORE any probe that precedes an epoch append (see
    * [[appendToIvfIndexEpoch]]). */
  def cleanPartialAnnEpoch(spark: org.apache.spark.sql.SparkSession,
                           path: String, epochId: Long,
                           queryId: String = "stream"): Unit =
    graft.io.EpochCommit.cleanPartial(spark, path, annComponents,
      epochId, queryId)

  /** True iff `epochId` of `queryId` has been committed into the ANN
    * index at `path` by [[appendToIvfIndexEpoch]]. */
  def annEpochCommitted(spark: org.apache.spark.sql.SparkSession,
                        path: String, queryId: String,
                        epochId: Long): Boolean =
    graft.io.EpochCommit.committed(spark, path, queryId, epochId)

  /** Compact a persisted IVF index's inverted lists back to disjoint
    * per-file bucket ranges (appends overlap earlier files LSM-style and
    * degrade file skipping until compaction). Delegates to
    * [[compactAnnIndex]] — on a path where IVF lists and PQ codes are
    * colocated, ALL live components compact together so the shared
    * tombstone sidecar is cleared exactly once after every component has
    * applied it (clearing after only one would leave the other keeping
    * deleted ids physically and, worse, unmasked — a silent takedown
    * failure). */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, indexFiles: Int = 32): Unit =
    compactAnnIndex(spark, path, indexFiles)

  /** Compact a persisted IVF-PQ index's code lists (same contract as
    * [[compactIvfIndex]]: the whole colocated family compacts together). */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, indexFiles: Int = 32): Unit =
    compactAnnIndex(spark, path, indexFiles)

  /** Compact EVERY live ANN component at `path` ("assignments" inverted
    * lists and/or "codes" PQ lists), applying pending tombstones
    * physically to each, then clear the path-shared sidecar ONCE. The
    * sidecar must outlive each per-component rewrite: the deletion set is
    * path-scoped, so it is only spent when no live component still needs
    * it. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, indexFiles: Int = 32): Unit = {
    val live = annComponents.filter { c =>
      val p = new org.apache.hadoop.fs.Path(
        graft.io.Tables.resolveComponent(spark, s"$path/$c"))
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    // exclude partial promotes of a downed stream — folding them into the
    // new version under fresh names would strand the replay's
    // cleanPartialAnnEpoch (same hazard as the dedup index; see
    // EpochCommit.dropUncommitted)
    val dropPartial = graft.io.EpochCommit.dropUncommitted(spark, path, live)
    // independent components rewrite as concurrent Spark jobs (see
    // Dedup.compactDedupIndex)
    graft.io.Fs.inParallel(live) { c =>
      graft.io.Tables.compactSorted(spark, s"$path/$c", indexFiles,
        dedupe = false, "bucket")(df => tombstoneMask(spark, path)(
        dropPartial(df)))
    }
    if (live.nonEmpty) clearTombstones(spark, path)
  }

  /**
   * Takedown/opt-out support for the ANN indexes — delete vectors WITHOUT
   * a rebuild: ids land in a `tombstones/` sidecar, probes mask the
   * stored lists against it (broadcast anti-join on `cand_id` — the
   * tombstone set is takedown-sized), and the next compaction applies the
   * deletions physically and clears the sidecar. Works identically for
   * IVF inverted lists and IVF-PQ code lists (each index owns its
   * sidecar). Deleted ids must never be reused.
   */
  def deleteFromAnnIndex(ids: DataFrame, path: String,
                         idCol: String = "vec_id"): Unit = {
    // write tombstones in the STORED id type (read from whichever
    // component lives at the path) — a type-mismatched anti-join would
    // silently match nothing and ignore the deletions
    val spark = ids.sparkSession
    val idType = Seq("assignments", "codes").view
      .flatMap(c =>
        graft.io.Tables.storedColumnType(spark, s"$path/$c", "cand_id"))
      .headOption.getOrElse(org.apache.spark.sql.types.LongType)
    ids.select(col(idCol).cast(idType).as("cand_id")).distinct()
      .coalesce(1).write.mode("append").parquet(s"$path/tombstones")
  }

  private def tombstoneMask(spark: org.apache.spark.sql.SparkSession,
                            path: String): DataFrame => DataFrame =
    graft.io.Tables.tombstoneMask(spark, path, "cand_id")

  private def clearTombstones(spark: org.apache.spark.sql.SparkSession,
                              path: String): Unit =
    graft.io.Tables.clearTombstones(spark, path)

  /** File-count auto-compaction trigger for the IVF inverted lists (same
    * heuristic as [[graft.ext.Dedup.maybeCompactDedupIndex]] — appends
    * overlap earlier files LSM-style; count proxies the lost skipping).
    * @return true if a compaction ran. */
  def maybeCompactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String, maxFiles: Int = 64,
                           indexFiles: Int = 32): Boolean = {
    val over =
      graft.io.Tables.parquetFileCount(spark, s"$path/assignments") > maxFiles
    if (over) compactIvfIndex(spark, path, indexFiles)
    over
  }

  /** [[maybeCompactIvfIndex]] for the IVF-PQ code lists. */
  def maybeCompactPqIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, maxFiles: Int = 64,
                          indexFiles: Int = 32): Boolean = {
    val over =
      graft.io.Tables.parquetFileCount(spark, s"$path/codes") > maxFiles
    if (over) compactPqIndex(spark, path, indexFiles)
    over
  }

  /** Query a persisted IVF index: same probe plan as [[ivfTopK]], but the
    * corpus side is the stored, bucket-sorted inverted lists — no
    * re-training, no re-assignment, parquet file skipping on the probed
    * cells. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nprobe: Int = 4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val (cents, dim) = loadIvfCentroids(spark, path)
    val assigned = tombstoneMask(spark, path)(spark.read.parquet(
      graft.io.Tables.resolveComponent(spark, s"$path/assignments")))
    probeIndex(assigned, cents, dim, queries, k, nprobe, idCol, vecCol)
  }

  // ---------------------------------------------------------------------
  // Product quantization (PQ): the memory side of the 100 TB ANN story.
  // IVF-Flat stores the full vector per posting (dim × 4 bytes); PQ
  // stores an m-byte code (m = 8 here → 32× smaller at dim 64), so the
  // inverted lists of a 100 TB embedding corpus fit a cluster's disks
  // and a probe's scan is m table lookups per candidate instead of a
  // dim-float dot. Jégou et al., TPAMI 2011. Divergence from the paper's
  // IVFADC: codes quantize the normalized vector directly, NOT the
  // residual to the coarse centroid — one shared codebook, appends never
  // depend on the coarse cell, and the recall cost at our scale is
  // pinned by PqSpec (residual encoding is a drop-in refinement: train
  // the same codebooks on `vec - centroid(bucket)`).
  // ---------------------------------------------------------------------

  /**
   * Train PQ codebooks: per subspace `sub` of size `dsub = dim / m`,
   * k-means with `ksub` sub-centroids over the L2-NORMALIZED corpus
   * vectors (cosine via unit-vector L2, see [[graft.functions.PqKernel]]).
   * Same bounded-model-state contract as [[trainQuantizer]]: init is a
   * hash-ordered `limit(ksub)` collect, Lloyd refinement runs on a
   * bounded hash-ordered sample that stays distributed, and only the
   * (m × ksub × dsub) mean matrix reaches the driver per iteration.
   * Returns the flat row-major codebook matrix + dim.
   */
  def trainPqCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
                       kmeansIters: Int = 2, sampleFactor: Int = 64,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): (Array[Float], Int) =
    trainPqCore(corpus.select(col(idCol), normalized(vecCol)), m, ksub,
      kmeansIters, sampleFactor, idCol, vecCol, kernelNormalize = true)

  /** Residual codebooks (the TPAMI IVFADC refinement): k-means per
    * subspace over `v̂ - centroid(cell)` — residual magnitudes are a
    * fraction of the unit sphere's, so the same `m × ksub` budget
    * quantizes much finer. Assignment during Lloyd must NOT re-normalize
    * (residuals are already code-space), hence the `normalize = false`
    * kernel path. */
  def trainPqCodebooksResidual(corpus: DataFrame, cents: Array[Float],
                               dim: Int, m: Int = 8, ksub: Int = 16,
                               kmeansIters: Int = 2, sampleFactor: Int = 64,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): Array[Float] = {
    import graft.functions.PqFunctions.residual_vec
    trainPqCore(
      corpus.select(col(idCol),
        residual_vec(col(vecCol), cents, dim).as(vecCol)),
      m, ksub, kmeansIters, sampleFactor, idCol, vecCol,
      kernelNormalize = false)._1
  }

  private def trainPqCore(prepared: DataFrame, m: Int, ksub: Int,
                          kmeansIters: Int, sampleFactor: Int,
                          idCol: String, vecCol: String,
                          kernelNormalize: Boolean): (Array[Float], Int) = {
    import graft.functions.PqFunctions.pq_assign
    val initRows = prepared
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(ksub)
      .collect()
    require(initRows.nonEmpty, "corpus is empty — no PQ codebooks")
    val dim = initRows.head.getSeq[Float](1).length
    require(m > 0 && dim % m == 0, s"dim $dim must be a multiple of m=$m")
    val dsub = dim / m
    var cb = new Array[Float](m * ksub * dsub)
    initRows.zipWithIndex.foreach { case (r, c) =>
      val v = r.getSeq[Float](1)
      // wrong-length rows leave their init slot zero rather than throwing
      // — the same tolerance the encode/assign kernels document
      if (v.length == dim) {
        var sub = 0
        while (sub < m) {
          var t = 0
          while (t < dsub) {
            cb(sub * ksub * dsub + c * dsub + t) = v(sub * dsub + t)
            t += 1
          }
          sub += 1
        }
      }
    }
    // fewer init rows than ksub: the remaining sub-centroids stay zero —
    // harmless (they only ever win for near-zero subvectors)

    if (kmeansIters > 0) {
      // wrong-length vectors must not reach the Lloyd update: pq_assign
      // gives them an EMPTY code, element_at on it yields null, and the
      // driver-side getInt would NPE — filter them out of the sample
      val sample = prepared
        .filter(size(col(vecCol)) === dim)
        .orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(math.max(ksub * sampleFactor, ksub))
        .cache()
      try {
        for (_ <- 1 to kmeansIters) {
          val means = sample
            .select(pq_assign(col(vecCol), cb, dim, m, ksub,
                normalize = kernelNormalize).as("codes"),
              posexplode(col(vecCol)).as(Seq("pos", "x")))
            .select(
              (col("pos") / lit(dsub)).cast("int").as("sub"),
              (col("pos") % lit(dsub)).as("t"), col("codes"), col("x"))
            .select(col("sub"), col("t"),
              element_at(col("codes"), col("sub") + 1).as("c"), col("x"))
            // all-zero vectors (normalizing path) get an EMPTY code →
            // null c; they carry no direction and must not move any
            // sub-centroid
            .filter(col("c").isNotNull)
            // fixed-point mean for bit-deterministic training — same
            // rationale as [[trainQuantizer]]'s Lloyd update
            .groupBy("sub", "c", "t")
            .agg((sum(round(col("x") * 1e7).cast("long")).cast("double") /
              count(lit(1)) / 1e7).as("mean"))
            .collect() // ≤ m × ksub × dsub rows — metadata-sized
          val next = cb.clone() // empty cells keep their old sub-centroid
          means.foreach { r =>
            next(r.getInt(0) * ksub * dsub + r.getInt(1) * dsub +
              r.getInt(2)) = r.getDouble(3).toFloat
          }
          cb = next
        }
      } finally sample.unpersist()
    }
    (cb, dim)
  }

  /** L2-normalize `vecCol` (float array), keeping the column name. Zero
    * vectors pass through unchanged — same degenerate handling as the
    * kernels. */
  private def normalized(vecCol: String): org.apache.spark.sql.Column = {
    val n2 = aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    when(n2 > 0.0d, transform(col(vecCol),
      x => (x.cast("double") / sqrt(n2)).cast("float")))
      .otherwise(col(vecCol)).as(vecCol)
  }

  /** Shared ADC probe tail: compressed candidates (`cand_id`, `code`)
    * against queries carrying a precomputed distance table; bounded
    * top-k, queries broadcast. `joinCols` non-empty adds the IVF bucket
    * equi-key. */
  private def adcTopK(codes: DataFrame, probes: DataFrame, k: Int,
                      joinCols: Seq[String]): DataFrame = {
    import graft.functions.PqFunctions.pq_adc
    val joined =
      if (joinCols.isEmpty)
        codes.join(broadcast(probes), col("cand_id") =!= col("query_id"))
      else codes.join(broadcast(probes), joinCols)
        .filter(col("cand_id") =!= col("query_id"))
    joined
      .select(col("query_id"), col("cand_id"),
        pq_adc(col("__tbl"), col("code")).as("score"))
      .groupBy("query_id")
      .agg(top_k_by(col("score"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"))
  }

  /** In-session PQ brute scan: every candidate is scored (no IVF cells),
    * but each candidate costs m table lookups on an m-byte code — the
    * compressed flat-scan baseline. Scores are APPROXIMATE cosines
    * (quantization error bounded by the codebook fit; recall pinned in
    * PqSpec). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ksub: Int = 16, kmeansIters: Int = 2,
             sampleFactor: Int = 64, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    import graft.functions.PqFunctions.{pq_dist_table, pq_encode}
    val (cb, dim) = trainPqCodebooks(corpus, m, ksub, kmeansIters,
      sampleFactor, idCol, vecCol)
    val codes = corpus.select(col(idCol).as("cand_id"),
      pq_encode(col(vecCol), cb, dim, m, ksub).as("code"))
    val probes = queries.select(col(idCol).as("query_id"),
      pq_dist_table(col(vecCol), cb, dim, m, ksub).as("__tbl"))
    adcTopK(codes, probes, k, Nil)
  }

  /**
   * Persisted IVF-PQ index — [[buildIvfIndex]]'s layout with codes in
   * place of vectors:
   *   `centroids/`     — coarse quantizer, (cell, centroid)
   *   `pq_codebooks/`  — (sub, c, subcentroid), m × ksub rows
   *   `codes/`         — (bucket, cand_id, code binary), bucket-sorted
   *                      parquet with per-file range skipping
   * The codes table is ~`m + 12` bytes per vector — the piece that must
   * scale to 100 TB — while both models stay metadata-sized.
   */
  def buildPqIndex(corpus: DataFrame, path: String,
                   numCentroids: Int = 256, m: Int = 8, ksub: Int = 16,
                   kmeansIters: Int = 2, sampleFactor: Int = 64,
                   indexFiles: Int = 32, residual: Boolean = false,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (cents, dim) = trainQuantizer(corpus, numCentroids, kmeansIters,
      sampleFactor, idCol, vecCol)
    (0 until cents.length / dim)
      .map(c => (c, cents.slice(c * dim, (c + 1) * dim).toSeq))
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    val cb =
      if (residual) trainPqCodebooksResidual(corpus, cents, dim, m, ksub,
        kmeansIters, sampleFactor, idCol, vecCol)
      else trainPqCodebooks(corpus, m, ksub, kmeansIters, sampleFactor,
        idCol, vecCol)._1
    val dsub = dim / m
    (0 until m).flatMap { sub =>
      (0 until ksub).map { c =>
        (sub, c, cb.slice(sub * ksub * dsub + c * dsub,
          sub * ksub * dsub + (c + 1) * dsub).toSeq)
      }
    }.toDF("sub", "c", "subcentroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/pq_codebooks")
    Seq(residual).toDF("residual")
      .repartition(1).write.mode("overwrite").parquet(s"$path/params")
    graft.io.Tables.resetIndexState(corpus.sparkSession, path, Seq("codes"))
    graft.io.Tables.writeSortedBy(
      encodeCodes(corpus, cents, cb, dim, m, ksub, residual, idCol, vecCol),
      s"$path/codes", indexFiles, "bucket")
  }

  /** (cand_id, code, bucket) under either encoding mode. The residual
    * path pulls both fields from ONE struct-returning kernel so the
    * coarse `numCentroids × dim` scan runs once per row (subexpression
    * elimination), not once for the bucket and again inside the encode. */
  private def encodeCodes(vecs: DataFrame, cents: Array[Float],
                          cb: Array[Float], dim: Int, m: Int, ksub: Int,
                          residual: Boolean, idCol: String,
                          vecCol: String): DataFrame = {
    import graft.functions.GraftFunctions.nearest_centroids
    import graft.functions.PqFunctions.{pq_encode, pq_encode_res_row}
    if (residual) {
      val bc = pq_encode_res_row(col(vecCol), cents, cb, dim, m, ksub)
      vecs.select(col(idCol).as("cand_id"),
        bc.getField("code").as("code"),
        bc.getField("bucket").as("bucket"))
    } else
      vecs.select(col(idCol).as("cand_id"),
        pq_encode(col(vecCol), cb, dim, m, ksub).as("code"),
        nearest_centroids(col(vecCol), cents, dim, 1).getItem(0).as("bucket"))
  }

  /** Read the index's encoding mode (raw-vector PQ for indexes written
    * before the residual option existed). */
  private def pqIndexResidual(spark: org.apache.spark.sql.SparkSession,
                              path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) &&
      spark.read.parquet(s"$path/params").head().getBoolean(0)
  }

  /** Load the metadata-sized PQ codebook matrix of a persisted index. */
  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      path: String): (Array[Float], Int, Int, Int) = {
    val rows = spark.read.parquet(s"$path/pq_codebooks")
      .orderBy("sub", "c").collect() // m × ksub rows — metadata-sized
    require(rows.nonEmpty, s"no PQ codebooks at $path/pq_codebooks")
    val dsub = rows.head.getSeq[Float](2).length
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.length / m
    val cb = new Array[Float](m * ksub * dsub)
    rows.foreach { r =>
      val off = (r.getInt(0) * ksub + r.getInt(1)) * dsub
      val v = r.getSeq[Float](2)
      var t = 0
      while (t < dsub) { cb(off + t) = v(t); t += 1 }
    }
    (cb, m, ksub, dsub)
  }

  /** Append new vectors to a persisted IVF-PQ index: encode with the
    * STORED codebooks and assign cells with the STORED coarse quantizer
    * (both are model state — appends never retrain, so existing codes
    * stay comparable), then add bucket-sorted code files (LSM-style,
    * like [[appendToIvfIndex]]). Contract: new ids are disjoint from
    * ids already in the index. */
  def appendToPqIndex(newVecs: DataFrame, path: String, indexFiles: Int = 4,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val spark = newVecs.sparkSession
    val (cents, dim) = loadIvfCentroids(spark, path)
    val (cb, m, ksub, _) = loadPqCodebooks(spark, path)
    encodeCodes(newVecs, cents, cb, dim, m, ksub,
        pqIndexResidual(spark, path), idCol, vecCol)
      .repartitionByRange(indexFiles, col("bucket"))
      .sortWithinPartitions("bucket")
      .write.mode("append").parquet(
        graft.io.Tables.resolveComponent(newVecs.sparkSession,
          s"$path/codes"))
  }

  /** Query a persisted IVF-PQ index: probe the `nprobe` nearest coarse
    * cells, ADC-score their stored codes, bounded top-k. Same plan shape
    * as [[ivfTopKFromIndex]] with the inverted-list payload 32× smaller
    * and the per-candidate arithmetic m lookups instead of a dim-dot. */
  def pqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int, nprobe: Int = 4,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.GraftFunctions.nearest_centroids
    import graft.functions.PqFunctions.{pq_dist_table, pq_dist_table_res}
    val (cents, dim) = loadIvfCentroids(spark, path)
    val (cb, m, ksub, _) = loadPqCodebooks(spark, path)
    val codes = tombstoneMask(spark, path)(spark.read.parquet(
      graft.io.Tables.resolveComponent(spark, s"$path/codes")))
    val probes =
      if (pqIndexResidual(spark, path))
        // residual tables are PER (query, probed cell) — computed after
        // the explode, still queries × nprobe rows on the broadcast side
        queries.select(col(idCol).as("query_id"), col(vecCol),
            explode(nearest_centroids(col(vecCol), cents, dim, nprobe))
              .as("bucket"))
          .select(col("query_id"), col("bucket"),
            pq_dist_table_res(col(vecCol), col("bucket"), cents, cb,
              dim, m, ksub).as("__tbl"))
      else queries.select(col(idCol).as("query_id"),
        pq_dist_table(col(vecCol), cb, dim, m, ksub).as("__tbl"),
        explode(nearest_centroids(col(vecCol), cents, dim, nprobe))
          .as("bucket"))
    adcTopK(codes, probes, k, Seq("bucket"))
  }

  /**
   * Two-stage PQ search with exact re-rank (the FAISS-style shortlist
   * pattern): the ADC scan — m byte-lookups per candidate over the
   * compressed codes — picks a `rerank × k` shortlist per query, then
   * ONLY the shortlist rows fetch their full vectors (an id-equi-join
   * against the corpus, shortlist side broadcast: `queries × rerank × k`
   * rows — metadata-sized by construction) for exact cosine ordering.
   * Quantization error then costs recall only when a true neighbor falls
   * outside the shortlist, not whenever codes mis-order two candidates —
   * the difference between ~0.3 and ~1.0 recall@5 on unclustered
   * embeddings (tools/ProbePq).
   */
  def pqTopKRerank(corpus: DataFrame, queries: DataFrame, k: Int,
                   rerank: Int = 10, m: Int = 8, ksub: Int = 16,
                   kmeansIters: Int = 2, sampleFactor: Int = 64,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val shortlist = pqTopK(corpus, queries, k * rerank, m, ksub,
      kmeansIters, sampleFactor, idCol, vecCol)
    exactRerank(shortlist, corpus, queries, k, idCol, vecCol)
  }

  /** [[pqTopKRerank]] against a persisted IVF-PQ index: probe cells, ADC
    * shortlist, exact re-rank from the ORIGINAL vectors (`corpus` — the
    * index stores only codes; at 100 TB the full vectors live in the
    * source table and the re-rank join touches `queries × rerank × k`
    * of them). */
  def pqTopKFromIndexRerank(spark: org.apache.spark.sql.SparkSession,
                            path: String, corpus: DataFrame,
                            queries: DataFrame, k: Int, rerank: Int = 10,
                            nprobe: Int = 4, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val shortlist = pqTopKFromIndex(spark, path, queries, k * rerank,
      nprobe, idCol, vecCol)
    exactRerank(shortlist, corpus, queries, k, idCol, vecCol)
  }

  /** Exact-cosine re-rank of a (query_id, neighbor_id) shortlist: fetch
    * both vectors, score exactly, keep top-k. The shortlist is the small
    * side by construction and broadcasts; the corpus join is an
    * equi-join on the id (pointwise fetch, no corpus shuffle). */
  private def exactRerank(shortlist: DataFrame, corpus: DataFrame,
                          queries: DataFrame, k: Int, idCol: String,
                          vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    c.join(broadcast(shortlist.select("query_id", "neighbor_id")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("__qv"), col("__cv")).as("score"))
      .groupBy("query_id")
      .agg(top_k_by(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"))
  }

  /** Train spherical-k-means centroids and return them row-major
    * (`k × dim`). Deterministic given the input (hash-ordered init and
    * sample) up to floating-point reduction order in the per-cell means —
    * train ONCE and persist/bake the result as model state (the
    * [[semanticClusters]] contract), exactly like a stored IVF
    * quantizer. */
  def trainCentroids(corpus: DataFrame, numCentroids: Int,
                     kmeansIters: Int = 2, sampleFactor: Int = 64,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Array[Array[Float]] = {
    val (flat, dim) = trainQuantizer(corpus, numCentroids, kmeansIters,
      sampleFactor, idCol, vecCol)
    flat.grouped(dim).toArray
  }

  /**
   * Cluster assignment against FIXED centroids (model state, e.g. from
   * [[trainCentroids]]): appends a 1-based `cluster` column — the first
   * centroid of maximal cosine similarity (`array_position` of the max,
   * so ties break toward the lowest centroid id). A narrow, shuffle-free
   * map with one codegen cosine kernel per centroid; the centroids ride
   * along as literals like a broadcast dim.
   */
  def semanticClusters(vecs: DataFrame, centroids: Array[Array[Float]],
                       vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val scores = array(centroids.map(c =>
      cosine_sim(col(vecCol), typedlit(c.toSeq))): _*)
    vecs.withColumn("cluster",
      array_position(scores, array_max(scores)))
  }

  /**
   * SemDeDup-shaped semantic near-duplicate pairs: assign every vector
   * to its nearest fixed centroid, then emit within-cluster pairs with
   * cosine >= `threshold`. The clusters BLOCK the quadratic comparison —
   * the all-pairs join runs per cluster, never corpus-wide (the scale
   * contract; size `centroids.length` so the largest cluster's pair
   * count fits a task, and cap/salt oversized cells like
   * [[Dedup.bucketPairs]] when real data skews). Cross-cluster
   * near-duplicates are NOT found — that recall trade-off is the
   * SemDeDup design point, and the oracle mirrors the same restriction
   * exactly.
   */
  def semanticDedupPairs(vecs: DataFrame, centroids: Array[Array[Float]],
                         threshold: Double, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val assigned = semanticClusters(
      vecs.select(col(idCol), col(vecCol)), centroids, vecCol)
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"),
      col(vecCol).as("__va"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine_sim(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("cluster"), col("id_a"), col("id_b"), col("cosine"))
  }
}
