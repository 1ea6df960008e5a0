package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table management for co-located joins (SURVEY §7.4 item 8:
 * "joins must be key-partitioned"). Writing both fact tables bucketed by
 * the join key with the same bucket count lets Spark join them with NO
 * shuffle exchange on either side — at 100 TB that removes the single
 * largest network cost of a fact-fact join. Bucket counts should be sized
 * so a bucket fits in one task (rows/buckets × row width ≲ task memory).
 */
object Tables {

  /** Persist `df` as a bucketed (and bucket-sorted) table. With `location`
    * the table is EXTERNAL (data at the given path, catalog entry
    * per-session); without, a managed table under the warehouse dir.
    * Bucket metadata lives in the catalog, not the files — a plain
    * parquet read of the path sees the rows but not the bucketing. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sorted: Boolean = true,
                    location: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    val w = location.fold(w0)(p => w0.option("path", p))
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free when
    * bucket counts match (verify with `.explain`: no Exchange). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /**
   * Day-partitioned event layout: `path/<dateCol>=yyyy-MM-dd/part-*.parquet`.
   * Date-range predicates then prune at the DIRECTORY level
   * (`PartitionFilters` in the scan) — on a 100 TB event store, a one-day
   * query reads one day, not 100 TB. `maxRecordsPerFile` bounds part sizes
   * (the K2 rolling-policy knob generalized to batch layout).
   */
  def writeDayPartitioned(df: DataFrame, path: String, tsCol: String,
                          dateCol: String = "event_date",
                          maxRecordsPerFile: Long = 5000000): Unit =
    df.withColumn(dateCol, org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col(tsCol)))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(dateCol)
      .parquet(path)

  /**
   * PARTITION-PURE layout for [[ManifestTable.createPartitioned]]: every
   * output file holds exactly ONE value of `partCol`, so a manifest
   * recording per-file (min, max) of the column sees min == max and can
   * serve partition-level deletes/overwrites as metadata-only commits
   * and partition reads as manifest-pruned file lists. Fully
   * distributed — one shuffle clustering rows by partition value, then
   * the `partitionBy` writer splits each task's rows per value (the
   * duplicate `__p` column is consumed by the writer; `partCol` itself
   * stays IN the data files, so every read path sees the full schema).
   * Rows are sorted by (`partCol`, `sortCol`) within tasks, so per-file
   * key stats stay tight too.
   *
   * `numFiles` picks the write shape. 0 (default): hash-cluster on the
   * partition value — ONE shuffle, no sampling pass, one file per value
   * — right for small commit batches (a CDC merge's touched rows).
   * >0: RANGE-partition on (`partCol`, `sortCol`) into `numFiles`
   * tasks — a large partition value spans several contiguous tasks, so
   * a 100 GB partition becomes ~`numFiles × its row share` files
   * written in parallel instead of one single-task straggler file, and
   * its files carry DISJOINT key ranges (tight merge touch-sets). A
   * task straddling two values still writes pure files — the
   * `partitionBy` writer splits by value within the task. Costs one
   * extra sampling job; use it for creates/overwrites/compactions of
   * big partitions, not per-commit batches.
   */
  def writePartitionPure(df: DataFrame, path: String, partCols: Seq[String],
                         sortCol: String, numFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    require(partCols.nonEmpty, "writePartitionPure needs partition columns")
    // each partition column is DUPLICATED into a `__p*` directory key
    // (`__p`, `__p2`, ...) so the real column's bytes stay in the file
    // — readers that ignore the directory layout still see every column
    val tags = partCols.zipWithIndex.map { case (c, i) =>
      c -> (if (i == 0) "__p" else s"__p${i + 1}") }
    val tagged = tags.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(t, col(c)) }
    val shaped =
      if (numFiles > 0)
        tagged.repartitionByRange(numFiles,
          (partCols.map(col) :+ col(sortCol)): _*)
      else tagged.repartition(tags.map(t => col(t._2)): _*)
    shaped
      .sortWithinPartitions((partCols.map(col) :+ col(sortCol)): _*)
      .write.partitionBy(tags.map(_._2): _*).mode("overwrite").parquet(path)
  }


  /**
   * Small-file compaction: rewrite a parquet directory into
   * `ceil(bytes / targetFileBytes)` files. Streaming sinks and
   * fine-grained partition writes accumulate small files; at 100 TB the
   * resulting driver/namenode listing pressure and per-file task overhead
   * dominate read cost, so periodic compaction is part of operating the
   * store. Input size comes from the filesystem (no data pass); the
   * rewrite is one shuffle-free coalesce when shrinking file count, or a
   * round-robin repartition when growing it.
   */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val df = spark.read.parquet(inPath)
    val current = df.rdd.getNumPartitions
    val out = if (nFiles < current) df.coalesce(nFiles.toInt)
              else df.repartition(nFiles.toInt)
    out.write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /**
   * Data-skipping-friendly layout: range-partition on `sortCols` and sort
   * within each partition before writing. Parquet row-group min/max stats
   * on the sort columns then become tight and DISJOINT across files, so
   * point/range predicates skip whole files instead of scanning — the
   * batch analogue of clustering/Z-ordering on a single key prefix.
   */
  def writeSortedBy(df: DataFrame, path: String, numFiles: Int,
                    sortCols: String*): Unit = {
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    // single-file writes skip repartitionByRange: its boundary-sampling
    // pass is a whole extra job, pure overhead when everything lands in
    // one partition anyway — small copy-on-write commits (a manifest
    // table's touched-file rewrite, an agg view's update) hit this
    // constantly
    val arranged =
      if (numFiles == 1) df.repartition(1).sortWithinPartitions(cols: _*)
      else df.repartitionByRange(numFiles, cols: _*)
        .sortWithinPartitions(cols: _*)
    arranged.write.mode("overwrite").parquet(path)
  }

  /**
   * Current data directory of a possibly-versioned component (see
   * [[compactSorted]]): versions live as SIBLING dirs `<dir>-v<N>`, each
   * committed by an atomic marker file `<name>.manifest-<N>` next to
   * them. The highest committed manifest wins; with none, the component
   * is the legacy flat layout — `dir` itself. One listing of the parent,
   * no data reads. Siblings (not subdirs) keep uncommitted version
   * directories invisible to any parquet read of the flat path — a
   * crashed compaction can never double a flat reader's rows.
   */
  def resolveComponent(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    if (parent == null) return dir
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(parent)) return dir
    val pre = p.getName + ".manifest-"
    val vs = fs.listStatus(parent).iterator
      .map(_.getPath.getName).filter(_.startsWith(pre))
      .map(_.drop(pre.length))
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).toSeq
    if (vs.isEmpty) dir else s"$dir-v${vs.max}"
  }

  /** Committed versions of a component whose DATA is still present,
    * ascending — version 0 is the flat legacy layout (no manifest; it
    * exists while the flat dir does). One parent listing, no data
    * reads. */
  def componentVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    if (parent == null) return Seq.empty
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(parent)) return Seq.empty
    val names = fs.listStatus(parent).map(_.getPath.getName).toSet
    val pre = p.getName + ".manifest-"
    val committed = names.filter(_.startsWith(pre)).map(_.drop(pre.length))
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .filter(v => names.contains(s"${p.getName}-v$v"))
    (if (names.contains(p.getName)) committed + 0L else committed)
      .toSeq.sorted
  }

  /** Data dir of a SPECIFIC committed version of a component — TIME
    * TRAVEL within the retention window ([[compactSorted]] keeps the
    * previous version for one full maintenance cycle): re-run last
    * cycle's probes against the exact snapshot a report was built from,
    * or diff two snapshots. None once retention has retired the
    * version's data, or for an uncommitted orphan (crashed compaction's
    * `-v<N>` dir without its manifest — never readable). */
  def resolveComponentAt(spark: SparkSession, dir: String,
                         version: Long): Option[String] = {
    val data = new org.apache.hadoop.fs.Path(
      if (version == 0) dir else s"$dir-v$version")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(data)) None
    else if (version == 0) Some(dir)
    else if (fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir.manifest-$version"))) Some(data.toString)
    else None
  }

  /** DataType of `colName` as stored by a component's CURRENT version
    * (one parquet footer read, no data pass); None when the component
    * does not exist yet or stores no such column. Tombstone writers use
    * this so deletion keys are written in the index's own key type — an
    * anti-join between mismatched types silently matches nothing, which
    * would turn a takedown into a no-op. */
  def storedColumnType(spark: SparkSession, dir: String, colName: String)
      : Option[org.apache.spark.sql.types.DataType] = {
    val p = new org.apache.hadoop.fs.Path(resolveComponent(spark, dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      try spark.read.parquet(p.toString).schema.fields
        .find(_.name == colName).map(_.dataType)
      catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** Anti-join mask over an index's `tombstones/` sidecar, keyed by
    * `keyCol` (long ids for dedup/ANN lists, content digests for the
    * exact index); identity when the index has no tombstones. Shared by
    * every probe path so deletion semantics can't drift per index. */
  def tombstoneMask(spark: SparkSession, indexPath: String,
                    keyCol: String): DataFrame => DataFrame = {
    val t = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(t)) identity
    else {
      val dead = spark.read.parquet(t.toString).select(keyCol)
      df => df.join(org.apache.spark.sql.functions.broadcast(dead),
        Seq(keyCol), "left_anti")
    }
  }

  /** Drop an index's tombstone sidecar — called by compactions after
    * applying the deletions physically, and by in-place REBUILDS (a stale
    * sidecar would mask legitimately re-indexed keys in the fresh index). */
  def clearTombstones(spark: SparkSession, indexPath: String): Unit = {
    val t = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    t.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(t, true)
  }

  /** Fresh-build hygiene for a whole index path — every builder calls
    * this first so an in-place REBUILD inherits nothing from a previous
    * life of the same path: component version manifests (stale data would
    * shadow the fresh flat layout), tombstones (deleted-then-reindexed
    * keys would be masked forever), and — for indexes with
    * epoch-idempotent streaming appends — the `_epochs`/`_staging` state
    * (a fresh-checkpoint stream would skip whole batches against old
    * commit markers). */
  def resetIndexState(spark: SparkSession, indexPath: String,
                      components: Seq[String],
                      clearEpochState: Boolean = false): Unit = {
    components.foreach(c => resetComponent(spark, s"$indexPath/$c"))
    clearTombstones(spark, indexPath)
    if (clearEpochState) {
      val conf = spark.sparkContext.hadoopConfiguration
      Seq("_epochs", "_staging").foreach { sub =>
        val d = new org.apache.hadoop.fs.Path(s"$indexPath/$sub")
        d.getFileSystem(conf).delete(d, true)
      }
    }
  }

  /** Remove every version dir and manifest of a component — in-place
    * REBUILD preparation: a fresh build writes the flat (version-0)
    * layout, which must resolve again; stale manifests from a compacted
    * previous life of the same path would otherwise shadow it. */
  def resetComponent(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    if (parent == null) return
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(parent)) return
    val name = p.getName
    fs.listStatus(parent).foreach { st =>
      val n = st.getPath.getName
      val ver = n.startsWith(name + "-v") &&
        n.length > name.length + 2 && n.drop(name.length + 2).forall(_.isDigit)
      if (n.startsWith(name + ".manifest-") || ver)
        fs.delete(st.getPath, true)
    }
  }

  /** Parquet data-file count of a component's CURRENT version (one
    * filesystem listing after [[resolveComponent]], no footer reads; 0
    * for a missing dir). The file-count signal behind auto-compaction
    * triggers: every `append*Index` adds files whose key ranges overlap
    * all earlier ones, so count tracks both listing pressure and degraded
    * file-skipping. */
  def parquetFileCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(resolveComponent(spark, dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  /**
   * Rewrite an append-accumulated component back into `numFiles` files
   * with DISJOINT per-file ranges on `sortCols` — LSM-style compaction
   * for the persisted index family: each `appendTo*Index` adds files
   * whose key ranges overlap earlier ones, degrading parquet file
   * skipping until a compaction restores it.
   *
   * Reader-concurrent via a minimal versioned manifest (the mechanism
   * every table format uses, reduced to one component): the rewrite goes
   * to a fresh SIBLING dir `<dir>-v<N+1>`, then an empty marker file
   * `<name>.manifest-<N+1>` is created — THE atomic commit point; readers
   * resolve the highest manifest at scan-listing time
   * ([[resolveComponent]]). Retention keeps the version current at this
   * call's entry (a concurrent reader that resolved it mid-compaction
   * keeps its files for one full maintenance cycle) and deletes
   * everything older — so a reader is only ever broken if it runs longer
   * than TWO compaction cycles, the table-format snapshot-expiry
   * contract. A crash before the marker leaves an invisible orphan dir,
   * overwritten by the retry; the flat legacy layout is version 0 and
   * migrates on first compaction. Appends route through
   * [[resolveComponent]] too, so they land in the current version —
   * appends and compaction still share one owner (the maintenance
   * window), only READERS gained concurrency. `dedupe = true`
   * additionally drops exact-duplicate rows (the exact-digest index,
   * where re-appending an already-indexed digest is harmless but
   * wasteful).
   */
  def compactSorted(spark: org.apache.spark.sql.SparkSession, dir: String,
                    numFiles: Int, dedupe: Boolean, sortCols: String*)(
                    transform: DataFrame => DataFrame = identity): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(dir)
    val fs = src.getFileSystem(conf)
    val cur = resolveComponent(spark, dir)
    val curVer = if (cur == dir) 0L
      else cur.substring(cur.lastIndexOf("-v") + 2).toLong
    val next = curVer + 1
    val df0 = transform(spark.read.parquet(cur))
    val df = if (dedupe) df0.distinct() else df0
    writeSortedBy(df, s"$dir-v$next", numFiles, sortCols: _*)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir.manifest-$next"), true)
      .close() // commit point: readers now resolve v<next>
    (0L until curVer).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        if (v == 0) dir else s"$dir-v$v"), true)
      if (v > 0)
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir.manifest-$v"), false)
    }
  }

  /**
   * Hash-clustered layout with a parquet BLOOM FILTER on a
   * high-cardinality lookup column — the "fetch one id out of 100 TB"
   * layout when the store cannot be sorted by that id (an event store is
   * ordered by time; a document store by crawl batch). Rows are
   * hash-clustered on `bloomCol` into `numFiles` files (every occurrence
   * of an id lands in exactly one file) and ordered by `orderCols`
   * within, and each file's footer carries a split-block bloom filter
   * for the column. A point predicate pushed to the scan then skips
   * every row group whose bloom rejects the id: ~1/numFiles of the store
   * is read, with no global sort and no secondary index to maintain.
   *
   * Dictionary encoding is disabled for the bloom column because at
   * warehouse scale a unique-id chunk always overflows the dictionary
   * page and falls back to plain — and parquet-mr DROPS the bloom when a
   * chunk stays fully dictionary-encoded (the dictionary itself already
   * serves as an exact membership filter), so small test files would
   * otherwise carry no bloom and the layout's skipping behavior would
   * differ between test and production scale.
   *
   * `expectedNdv` sizes the bloom (bits ≈ ndv × ~10 for the default 1%
   * FPP) and should be the PER-FILE distinct count, i.e. global ndv /
   * numFiles.
   */
  def writeHashClusteredBloom(df: DataFrame, path: String, numFiles: Int,
                              bloomCol: String, expectedNdv: Long,
                              orderCols: String*): Unit = {
    import org.apache.spark.sql.functions.col
    val clustered = df.repartition(numFiles, col(bloomCol))
    val ordered =
      if (orderCols.isEmpty) clustered
      else clustered.sortWithinPartitions(orderCols.map(col): _*)
    ordered.write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol",
        expectedNdv.toString)
      .option(s"parquet.enable.dictionary#$bloomCol", "false")
      .parquet(path)
  }

  /**
   * Z-ordered (Morton-curve) two-column layout: rows are range-partitioned
   * and sorted by the interleaved bits of BOTH key columns, so every
   * parquet file covers a small RECTANGLE of the (a, b) key space — its
   * min/max stats are narrow on BOTH columns, and predicates on EITHER
   * column (or both) skip files/row-groups. A single-column sort gives
   * perfect skipping on that column and none on the second; Z-ordering
   * trades a little of the first column's locality for skipping on both
   * (the standard lakehouse layout for two-dimensional predicates).
   *
   * Both columns are min/max-scaled to 32-bit fractions of their observed
   * range (one metadata-sized agg: 4 numbers) and bit-interleaved into a
   * 64-bit Morton code — pure Column bit arithmetic, fully codegen'd, no
   * UDF. Ties (degenerate ranges) degrade gracefully to the other column's
   * order. The z column is dropped before writing.
   */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    colA: String, colB: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val Array(minA, maxA, minB, maxB) =
      df.agg(min(colA).cast("double"), max(colA).cast("double"),
        min(colB).cast("double"), max(colB).cast("double"))
        .collect()(0).toSeq.map(v => Option(v).fold(0.0)(_.toString.toDouble))
        .toArray
    // value → 32-bit fraction of the observed range (clamped; constant
    // range → 0, the interleave then follows the other column alone)
    def frac(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(4294967295L), greatest(lit(0L),
        ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(4294967295.0))
          .cast("long")))
    // Morton spread: insert a 0 bit between each of the low 32 bits
    // (standard mask-shift ladder, 5 steps)
    def spread(c: Column): Column = {
      val s1 = (c.bitwiseOR(shiftleft(c, 16)))
        .bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 8)))
        .bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s3 = (s2.bitwiseOR(shiftleft(s2, 4)))
        .bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s4 = (s3.bitwiseOR(shiftleft(s3, 2)))
        .bitwiseAND(lit(0x3333333333333333L))
      (s4.bitwiseOR(shiftleft(s4, 1)))
        .bitwiseAND(lit(0x5555555555555555L))
    }
    // interleave the HIGH 16 bits of each fraction (32 z-bits carry the
    // file-level ordering; parquet stats do the intra-file work)
    val za = spread(shiftright(frac(col(colA), minA, maxA), 16))
    val zb = spread(shiftright(frac(col(colB), minB, maxB), 16))
    val z = za.bitwiseOR(shiftleft(zb, 1))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
