package graft.io

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Local-filesystem helpers shared by the verify/bench mains, dev tools,
  * and specs. */
object Fs {

  /** Recursive delete of a local path (no-op when absent). The
    * `Files.walk` stream is closed via try-with-resources — a leaked
    * stream holds a directory handle per call, which adds up across a
    * 100-query verify sweep or a large test suite. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p)) { st =>
        st.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      }

  /** Recursive delete by string path (local filesystem). */
  def deleteRecursively(dir: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(dir))

  /** Run `f` over `items` as concurrent threads and wait for ALL before
    * returning; the first failure is rethrown after every thread
    * finishes (no half-abandoned sibling work). Used to submit
    * INDEPENDENT Spark jobs concurrently — e.g. per-component index
    * compactions — so the scheduler interleaves their stages instead of
    * serializing whole jobs; Spark explicitly supports multi-threaded
    * job submission against one session. */
  def inParallel[A](items: Seq[A])(f: A => Unit): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = items.map { a =>
      val t = new Thread(() =>
        try f(a) catch { case e: Throwable => errs.add(e) })
      t.start(); t
    }
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

  /** All path names under `p` (inclusive) as strings, walk stream closed. */
  def walkNames(p: Path): Seq[String] =
    if (!Files.exists(p)) Seq.empty
    else scala.util.Using.resource(Files.walk(p)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.toString).toList
    }
}
