package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** footerStats — the metadata-only twin of statsFor's re-scan. The
  * contract: when it returns Some, the entries must be BIT-IDENTICAL
  * to what the scan would compute (rows, key min/max strings, extra
  * stats incl. all-null omission); when the layout has any column the
  * footers can't represent exactly, it must return None (the caller
  * re-scans); a null merge key is a loud error on BOTH paths. */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_fs").toString

  private def write(root: String, df: DataFrame, nFiles: Int,
                    sortCol: String = "k"): String = {
    val rel = "data/txn-1"
    Tables.writeSortedBy(df, s"$root/$rel", nFiles, sortCol)
    rel
  }

  /** The scan-path truth, computed independently of ManifestTable. */
  private def scanTruth(root: String, rel: String, key: String,
                        stats: Seq[String]): Map[String, (Long, String,
      String, Map[String, (String, String)])] = {
    val extraAggs = stats.flatMap(c => Seq(
      min(col(c)).cast("string"), max(col(c)).cast("string")))
    spark.read.option("recursiveFileLookup", "true").parquet(s"$root/$rel")
      .select(col(key).as("__k") +: col("_metadata.file_path").as("__f")
        +: stats.map(col): _*)
      .groupBy("__f")
      .agg(count(lit(1)).as("n"),
        (min("__k").cast("string").as("mn") +:
          max("__k").cast("string").as("mx") +: extraAggs): _*)
      .collect().map { r =>
        val abs = new java.net.URI(r.getString(0)).getPath
        val relPath = abs.substring(abs.lastIndexOf("/" + rel + "/") + 1)
        val extra = stats.zipWithIndex.flatMap { case (c, i) =>
          (Option(r.getString(4 + 2 * i)), Option(r.getString(5 + 2 * i))) match {
            case (Some(a), Some(b)) => Some(c -> (a, b))
            case _ => None
          }
        }.toMap
        relPath -> (r.getLong(1), r.getString(2), r.getString(3), extra)
      }.toMap
  }

  private def entriesOf(es: Seq[ManifestTable.FileEntry])
      : Map[String, (Long, String, String, Map[String, (String, String)])] =
    es.map(e => e.relPath -> (e.rows, e.min.get, e.max.get, e.extra)).toMap

  test("long key + int/string/date/boolean stats: footer entries are " +
    "bit-identical to the scan's, including nulls and an all-null column") {
    val root = tmp()
    val df = (0 until 500).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"name_${"%03d".format(i)}",
        i % 13, java.sql.Date.valueOf(s"199${i % 10}-0${i % 9 + 1}-15"),
        i % 2 == 0, null.asInstanceOf[String])
    }.toDF("k", "s", "i", "d", "b", "allnull")
      .withColumn("allnull", lit(null).cast("string"))
    val rel = write(root, df, 4)
    val stats = Seq("s", "i", "d", "b", "allnull")
    val got = ManifestTable.footerStats(spark, root, rel, "k",
      df.schema, stats, Nil)
    assert(got.isDefined, "footer path must engage on this layout")
    val truth = scanTruth(root, rel, "k", stats)
    assert(entriesOf(got.get) == truth)
    // the all-null column must be ABSENT from extras (scan parity)
    assert(got.get.forall(e => !e.extra.contains("allnull")))
  }

  test("unicode strings keep the unsigned byte-wise ordering Spark uses") {
    val root = tmp()
    // 'é' > 'z' in UTF-8 unsigned bytes but 'é'.toByte is NEGATIVE —
    // a signed compare would invert min/max
    val df = Seq((1L, "zebra"), (2L, "émile"), (3L, "apple"))
      .toDF("k", "s")
    val rel = write(root, df, 1)
    val got = ManifestTable.footerStats(spark, root, rel, "k",
      df.schema, Seq("s"), Nil)
    assert(got.isDefined)
    assert(entriesOf(got.get) == scanTruth(root, rel, "k", Seq("s")))
    assert(got.get.head.extra("s") == ("apple", "émile"))
  }

  test("double stats column and INT96 timestamp column each defeat the " +
    "footer path (None -> caller re-scans)") {
    val root = tmp()
    val df = Seq((1L, 1.5, new java.sql.Timestamp(1000L)))
      .toDF("k", "dbl", "ts")
    val rel = write(root, df, 1)
    assert(ManifestTable.footerStats(spark, root, rel, "k",
      df.schema, Seq("dbl"), Nil).isEmpty)
    assert(ManifestTable.footerStats(spark, root, rel, "k",
      df.schema, Seq("ts"), Nil).isEmpty)
    // but the same files with only supported columns requested pass
    assert(ManifestTable.footerStats(spark, root, rel, "k",
      df.schema, Nil, Nil).isDefined)
  }

  test("null merge key is a loud error, not a fallback") {
    val root = tmp()
    val df = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("k", "s")
    val rel = "data/txn-1"
    df.repartition(1).write.parquet(s"$root/$rel")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.footerStats(spark, root, rel, "k", df.schema, Nil, Nil)
    }
    assert(e.getMessage.contains("null merge key"))
  }

  test("column mapping: stats read the PHYSICAL column, keyed by the " +
    "LOGICAL name") {
    val root = tmp()
    // file holds physical names k0/s0; manifest speaks k/s
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k0", "s0")
    val rel = write(root, df, 2, sortCol = "k0")
    val logical = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType)))
    val got = ManifestTable.footerStats(spark, root, rel, "k", logical,
      Seq("s"), Seq("k" -> "k0", "s" -> "s0"))
    assert(got.isDefined)
    assert(got.get.map(_.rows).sum == 100L)
    assert(got.get.forall(e => e.extra.contains("s")))
  }

  test("a partition-pure nested txn layout is listed recursively") {
    val root = tmp()
    val df = (0 until 200).map(i => (i.toLong, i % 4, s"r$i"))
      .toDF("k", "p", "s")
    val rel = "data/txn-1"
    Tables.writePartitionPure(df, s"$root/$rel", Seq("p"), "k", 0)
    val got = ManifestTable.footerStats(spark, root, rel, "k",
      df.schema, Seq("p"), Nil)
    assert(got.isDefined)
    assert(got.get.map(_.rows).sum == 200L)
    assert(got.get.forall(e => e.relPath.startsWith("data/txn-1/")))
    // partition purity visible in the stats: each file's p min == max
    assert(got.get.forall(e => e.extra("p")._1 == e.extra("p")._2))
    assert(entriesOf(got.get) == scanTruth(root, rel, "k", Seq("p")))
  }
}
