package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{input_file_name, substring_index}

/**
 * Exactly-once epoch append protocol over a multi-component parquet
 * index — the filesystem analogue of
 * [[graft.io.Sinks.JdbcEpochIdempotent]]'s stage → promote → marker
 * sequence, factored out of the dedup index so EVERY persisted index
 * family (MinHash dedup, IVF/PQ ANN, exact-digest) shares one proven
 * implementation instead of re-deriving the crash cases per index.
 *
 * Structured Streaming's `foreachBatch` replays the last uncommitted
 * micro-batch after a crash; a plain append would then double that
 * batch's rows in the index, and — for indexes that are PROBED before
 * appending — the replayed batch would match its own half-landed files
 * and be dropped as a duplicate of itself. The protocol:
 *
 *   1. committed marker `_epochs/<queryId>-<epochId>` exists → return
 *      false, touch nothing (replay of a fully-committed epoch);
 *   2. delete any `ep-<queryId>-<epochId>-*` files from a PARTIAL
 *      previous promote (crash mid-rename) — [[cleanPartial]];
 *   3. stage the delta under `_staging/<queryId>-<epochId>/<component>`
 *      (underscore dirs are invisible to parquet reads of the
 *      components; overwrite semantics — restaging a crashed attempt
 *      replaces it);
 *   4. promote by per-file rename into each component under the
 *      deterministic epoch prefix (HDFS-atomic per file; the prefix is
 *      what makes step 2's cleanup possible);
 *   5. create the marker — THE commit point — then drop staging and
 *      prune markers far behind this commit.
 *
 * A crash at any point converges on replay. On rename-less object
 * stores (S3) promote is copy+delete — run compaction more often or
 * front with a real table format; on HDFS/local this is exactly-once.
 *
 * Compactions of an epoch-appended index MUST route their read through
 * [[dropUncommitted]]: folding a partial promote's files into a fresh
 * version under new names would strand the replay's [[cleanPartial]]
 * and turn the self-duplicate hazard back on.
 */
object EpochCommit {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(path: String, queryId: String, epochId: Long) =
    new Path(s"$path/_epochs/$queryId-$epochId")

  /** True iff `epochId` of `queryId` has been committed into the index. */
  def committed(spark: SparkSession, path: String, queryId: String,
                epochId: Long): Boolean = {
    val m = markerPath(path, queryId, epochId)
    fs(spark, m).exists(m)
  }

  /** Remove the PARTIALLY-promoted files of an uncommitted epoch (crash
    * between promote and marker). Callers that PROBE the index before an
    * epoch append must run this BEFORE the probe — the partial files
    * carry the replayed batch's own ids. Idempotent and cheap (one
    * listing per component) when there is nothing to clean. */
  def cleanPartial(spark: SparkSession, path: String,
                   components: Seq[String], epochId: Long,
                   queryId: String): Unit = {
    val prefix = s"ep-$queryId-$epochId-"
    components.foreach { sub =>
      val d = new Path(Tables.resolveComponent(spark, s"$path/$sub"))
      val f = fs(spark, d)
      if (f.exists(d))
        f.listStatus(d).filter(_.getPath.getName.startsWith(prefix))
          .foreach(st => f.delete(st.getPath, false))
    }
  }

  /**
   * Run the full protocol for one epoch. `stageDelta` receives the
   * staging root and must write each component's delta files to
   * `<stagingRoot>/<component>` (any component may be absent — an empty
   * delta for that component). Component versions are resolved ONCE
   * before staging: compaction only runs post-commit in the same owner
   * loop, so the resolved version cannot change between a partial
   * promote and its replay.
   *
   * @return true if this call performed the append, false if the epoch
   *         was already committed (replay detected).
   */
  def append(spark: SparkSession, path: String, components: Seq[String],
             epochId: Long, queryId: String, retainEpochs: Int = 100)
            (stageDelta: String => Unit): Boolean = {
    require(!queryId.contains('-'),
      "queryId must not contain '-' — it delimits the epoch file prefix, " +
      "and a hyphenated id could alias another query's committed files")
    val marker = markerPath(path, queryId, epochId)
    val f = fs(spark, marker)
    if (f.exists(marker)) return false
    cleanPartial(spark, path, components, epochId, queryId)
    val prefix = s"ep-$queryId-$epochId-"
    val compDirs = components
      .map(sub => sub -> Tables.resolveComponent(spark, s"$path/$sub")).toMap
    val staging = new Path(s"$path/_staging/$queryId-$epochId")
    stageDelta(staging.toString)
    components.foreach { sub =>
      val sd = new Path(s"$staging/$sub")
      if (f.exists(sd))
        f.listStatus(sd).filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { st =>
            val dst = new Path(s"${compDirs(sub)}/$prefix${st.getPath.getName}")
            require(f.rename(st.getPath, dst),
              s"epoch promote rename failed: ${st.getPath} -> $dst")
          }
    }
    f.mkdirs(marker.getParent)
    f.create(marker, true).close()
    f.delete(staging, true)
    // Marker retention: the engine replays at most the LAST uncommitted
    // micro-batch, so markers far behind the newest committed epoch can
    // never be consulted again — without pruning, a long-running query
    // accumulates one tiny file per micro-batch forever (millions of
    // namenode entries at one batch per few seconds). Keep a generous
    // window behind this commit for this queryId only.
    val qp = s"$queryId-"
    f.listStatus(marker.getParent)
      .filter(_.getPath.getName.startsWith(qp))
      .foreach { st =>
        val ep = st.getPath.getName.drop(qp.length)
        // length cap: a ≥19-digit name would overflow toLong; no real
        // epoch gets there, so just leave such a file alone
        if (ep.nonEmpty && ep.length <= 18 && ep.forall(_.isDigit) &&
            ep.toLong < epochId - retainEpochs)
          f.delete(st.getPath, false)
      }
    true
  }

  /** File-name prefixes (`ep-<query>-<epoch>-`) of UNCOMMITTED streaming
    * epochs present in the index components: an epoch is uncommitted iff
    * it is NEWER than its query's newest committed marker (markers behind
    * the retention window were pruned, but pruning only ever follows a
    * LATER commit — so an ep-file at or below the committed max is always
    * committed data, and one above it can only be a partial promote). */
  def uncommittedPrefixes(spark: SparkSession, path: String,
                          components: Seq[String]): Seq[String] = {
    def epochOf(s: String): Option[Long] =
      if (s.nonEmpty && s.length <= 18 && s.forall(_.isDigit)) Some(s.toLong)
      else None
    val epDir = new Path(s"$path/_epochs")
    val efs = fs(spark, epDir)
    val committedMax: Map[String, Long] =
      if (!efs.exists(epDir)) Map.empty
      else efs.listStatus(epDir).toSeq.flatMap { st =>
        val n = st.getPath.getName // <queryId>-<epoch>, queryId has no '-'
        val i = n.lastIndexOf('-')
        if (i <= 0) None
        else epochOf(n.drop(i + 1)).map(ep => n.take(i) -> ep)
      }.groupMapReduce(_._1)(_._2)(math.max)
    components.flatMap { sub =>
      val d = new Path(Tables.resolveComponent(spark, s"$path/$sub"))
      val f = fs(spark, d)
      if (!f.exists(d)) Nil
      else f.listStatus(d).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("ep-"))
        .flatMap { n =>
          n.drop(3).split("-", 3) match {
            case Array(qid, ep, _) if epochOf(ep).isDefined &&
                epochOf(ep).get > committedMax.getOrElse(qid, -1L) =>
              Some(s"ep-$qid-$ep-")
            case _ => None
          }
        }
    }.distinct
  }

  /** Compaction-side filter that EXCLUDES rows read from uncommitted
    * partial-promote files (identity when there are none). Excluded
    * files stay behind in the previous version directory, the replay
    * re-appends the full batch into the new version, and the orphans die
    * with version retention — a compaction racing a downed stream
    * converges instead of corrupting. */
  def dropUncommitted(spark: SparkSession, path: String,
                      components: Seq[String]): DataFrame => DataFrame = {
    val partial = uncommittedPrefixes(spark, path, components)
    if (partial.isEmpty) identity
    else { df =>
      val base = substring_index(input_file_name(), "/", -1)
      df.filter(!partial.map(base.startsWith(_)).reduce(_ || _))
    }
  }
}
