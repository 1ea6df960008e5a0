package graft.ext

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/**
 * Per-round lineage truncation for iterative DataFrame loops
 * ([[Dedup.connectedComponents]], [[Bpe.learnMerges]]): an iterative loop
 * doubles the logical plan every round — caching materializes the data but
 * the plan still nests, and analysis/stringification blows up
 * exponentially after ~15 rounds. Checkpointing truncates the lineage to
 * the materialized partitions, keeping every round O(1) in plan size
 * (found by the FuzzSpec random-graph property).
 *
 * With `checkpointDir` unset, [[snap]] uses eager `localCheckpoint` —
 * fast, but the truncated partitions live on executors, so on a real
 * cluster losing ONE executor mid-loop kills the job (the lineage needed
 * to recompute them is gone). With `checkpointDir` set, [[snap]] uses a
 * RELIABLE `checkpoint` into that directory (any Hadoop URI) — the
 * correct trade for a multi-round iterative job at 100 TB.
 *
 * Storage stays BOUNDED in reliable mode: the caller invokes
 * [[releasePrevious]] once the last reader of round N-1's snapshot has
 * run, which deletes that round's checkpoint files — at most two
 * table copies exist at any moment (not one per round, which at 100 TB
 * would grow storage by a full table copy per iteration). The FINAL
 * round's files are intentionally kept: the returned DataFrame reads from
 * them — remove the directory after consuming the result. Cleanup is
 * scoped to this SparkContext's own UUID subdirectory
 * (`sc.getCheckpointDir`), so a shared parent directory is safe.
 *
 * Side effect to know about: `setCheckpointDir` is GLOBAL SparkContext
 * state — other jobs in the same session that call `.checkpoint()`
 * afterwards will also write under this directory (in the same
 * per-context UUID subdir).
 */
private[ext] final class RoundCheckpointer(sc: SparkContext,
                                           checkpointDir: Option[String]) {
  checkpointDir.foreach(sc.setCheckpointDir)
  // the per-context checkpoint root (dir/<uuid> — setCheckpointDir
  // appends the UUID), for round-N-1 file cleanup
  private val ckptRoot = checkpointDir.flatMap(_ => sc.getCheckpointDir)
    .map(new org.apache.hadoop.fs.Path(_))
  private val fs = ckptRoot.map(_.getFileSystem(sc.hadoopConfiguration))
  // reliable mode tracks checkpoint DIRECTORIES; local mode tracks the
  // persisted RDD ids the eager localCheckpoint left behind (its blocks
  // otherwise stay pinned until the DataFrame is GC'd — the same
  // accumulation ADVICE flagged for operator-internal persists)
  private var prevDirs: Set[String] = Set.empty
  private var curDirs: Set[String] = Set.empty
  private var prevRdds: Set[Int] = Set.empty
  private var curRdds: Set[Int] = Set.empty

  private def rddDirs(): Set[String] = (for {
    root <- ckptRoot; f <- fs
    st <- Option(f.globStatus(new org.apache.hadoop.fs.Path(root, "rdd-*")))
  } yield st.map(_.getPath.toString).toSet).getOrElse(Set.empty)

  /** Eagerly checkpoint `df` (reliable iff `checkpointDir` is set),
    * tracking the storage it owns; the prior snapshot becomes "previous",
    * releasable via [[releasePrevious]] once its last reader has run. */
  def snap(df: DataFrame): DataFrame =
    if (checkpointDir.isDefined) {
      val before = rddDirs()
      val out = df.checkpoint() // eager — materializes the round
      prevDirs = prevDirs ++ curDirs // not yet released — keep both
      curDirs = rddDirs() -- before
      out
    } else {
      val out = df.localCheckpoint(true)
      prevRdds = prevRdds ++ curRdds
      // track EXACTLY the RDD the localCheckpoint pinned — the snapped
      // plan is a LogicalRDD over it. Diffing sc.getPersistentRDDs here
      // would over-capture: operator caches (Caching.register'd LSH
      // stages, CC edges) first materialize DURING this eager action and
      // would be unpersisted mid-loop — forcing recomputation every
      // later round and double-firing the dedup cap accumulators.
      curRdds = logicalRddId(out)
      out
    }

  /** The persisted RDD backing an eagerly localCheckpointed DataFrame
    * (its analyzed plan is a LogicalRDD over it). Empty on an unexpected
    * plan shape — then nothing is tracked and the snapshot is left to GC,
    * the pre-tracking behavior. */
  private def logicalRddId(df: DataFrame): Set[Int] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Set(l.rdd.id)
      case _ => Set.empty
    }

  private def release(dirs: Set[String], rdds: Set[Int]): Unit = {
    for (f <- fs; d <- dirs)
      f.delete(new org.apache.hadoop.fs.Path(d), true)
    for (id <- rdds; rdd <- sc.getPersistentRDDs.get(id))
      rdd.unpersist(blocking = false)
  }

  /** Release the previous round's snapshot (checkpoint files, or the
    * localCheckpoint's pinned blocks — NOT recomputable: lineage was
    * truncated). Call AFTER the last action that reads it. */
  def releasePrevious(): Unit = {
    release(prevDirs, prevRdds)
    prevDirs = Set.empty
    prevRdds = Set.empty
  }

  /** Release EVERYTHING including the current snapshot — only valid once
    * the loop's result has been fully consumed (e.g. the caller returns
    * driver-side model state, not a DataFrame over the snapshot). */
  def releaseAll(): Unit = {
    releasePrevious()
    release(curDirs, curRdds)
    curDirs = Set.empty
    curRdds = Set.empty
  }
}
