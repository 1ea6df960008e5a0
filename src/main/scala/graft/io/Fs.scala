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

  /** All path names under `p` (inclusive) as strings, walk stream closed. */
  def walkNames(p: Path): Seq[String] =
    if (!Files.exists(p)) Seq.empty
    else scala.util.Using.resource(Files.walk(p)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.toString).toList
    }
}
