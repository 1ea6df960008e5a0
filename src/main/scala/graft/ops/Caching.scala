package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/**
 * Scoped cache lifecycle for operator-internal persists.
 *
 * Several operators ([[graft.ext.Dedup]] LSH indexes, the
 * [[AsofJoin.asofJoinAdaptive]] hot-key set) persist shared intermediates
 * because their pipelines consume them more than once. Those persists are
 * created inside the operator, so the caller holds no handle to release
 * them — a long-lived session running many dedup/as-of passes would
 * accumulate pinned (spillable, but catalog-tracked) storage, releasable
 * only with the sledgehammer `spark.catalog.clearCache()`.
 *
 * This object gives the persists a scope without changing operator
 * signatures:
 *
 *  - Operators call [[register]] instead of `df.persist(level)` — same
 *    persist, but when a [[scoped]] block is active on the calling
 *    thread, the Dataset is recorded in that scope.
 *  - Callers wrap build-plan-then-materialize in `Caching.scoped { … }`:
 *    on exit every registered intermediate is unpersisted
 *    (non-blocking). Materialize INSIDE the block — the intermediates
 *    exist to be shared across the actions the block runs.
 *  - With no active scope, behavior is exactly the old contract:
 *    session-lifetime cache, `clearCache()` to release.
 *
 * Registration happens at plan-construction time (operator invocation) on
 * the caller's thread, so the thread-local scope is safe even though Spark
 * executes jobs on other threads. Scopes nest: each block releases only
 * the persists registered inside it.
 */
object Caching {

  private val scopes =
    new ThreadLocal[List[collection.mutable.ArrayBuffer[Dataset[_]]]] {
      override def initialValue: List[collection.mutable.ArrayBuffer[Dataset[_]]] = Nil
    }

  /** Persist `ds` at `level`; if a [[scoped]] block is active on this
    * thread, the persist is released when the block exits. Returns `ds`. */
  def register[T](ds: Dataset[T],
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    scopes.get() match {
      case head :: _ => head += ds
      case Nil       => ()
    }
    ds
  }

  /** Run `body`; on exit unpersist every intermediate [[register]]ed by
    * operators invoked inside it (including on failure). */
  def scoped[T](body: => T): T = {
    val buf = collection.mutable.ArrayBuffer.empty[Dataset[_]]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(ds => ds.unpersist(blocking = false))
    }
  }
}
