package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing query names: dump only those (dev iteration)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // custom SQL functions + the SQL DML routing rule (m30 runs
      // DELETE/UPDATE/MERGE statements through the catalog)
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    // ERROR, not WARN: WindowExec's metadata-sized "No Partition Defined"
    // advisories (adjudicated + PlanSpec-guarded) would otherwise bury
    // real failures in the 109-query sweep log.
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_RESUME=1: skip queries whose output already committed
    // (_SUCCESS present) — makes multi-hour large-SF sweeps resumable
    // after a crash. Unset for driver runs: fresh dump, unchanged contract.
    val resume = sys.env.get("GRAFT_VERIFY_RESUME").contains("1")
    val declared = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .filter { case (name, _) => !resume ||
        !new java.io.File(s"$outDir/$name/_SUCCESS").exists() }
    // A failed query must be LOUD: round 6 lost five queries from the
    // correctness artifact because this loop printed to stderr and wrote
    // nothing — the driver's JSON simply omitted them. Now every failure
    // is recorded in <outDir>/_ERRORS.json and the run exits non-zero if
    // written outputs != declared count, so a broken query can never
    // silently vanish again.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    declared.foreach { case (name, fn) =>
      // scope releases operator-internal persists (LSH indexes, hot-key
      // sets) as soon as the query's write completes — memory stays flat
      // across the whole sweep; clearCache is the belt for anything
      // built outside the Caching registry
      try graft.ops.Caching.scoped {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name FAILED: $msg")
        errors(name) = msg
        // leave no stale output dir from a previous run for this query —
        // recursive: a committer's leftover _temporary/ subtree would
        // survive a flat delete and be miscounted as a written output
        graft.io.Fs.deleteRecursively(s"$outDir/$name")
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_ERRORS.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    val written = declared.keys.count(n =>
      new java.io.File(s"$outDir/$n").isDirectory)
    spark.stop()
    if (errors.nonEmpty || written != declared.size) {
      System.err.println(
        s"[verify] FAILED: ${errors.size} queries threw, " +
        s"$written/${declared.size} outputs written -- see $outDir/_ERRORS.json")
      sys.exit(1)
    }
  }
}
