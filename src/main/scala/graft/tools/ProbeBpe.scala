package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Bpe
import graft.functions.GraftFunctions

/**
 * Dev probe: learn the fixed BPE merge table for the declared
 * `ext_bpe_encode` query from the sf0.01 documents table, print it as a
 * Scala literal, and check the safety property the DuckDB oracle depends
 * on: CANONICAL encode (lowest-rank-first, the kernel) must equal
 * IN-ORDER single-pass replay (what a nested-`replace` SQL mirror
 * computes) for this table on every document at every SF. The two differ
 * only when one merge's output string can be produced by two different
 * rules — flagged here if it ever happens.
 */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val merges = Bpe.learnMerges(docs01, numMerges = 24, minFreq = 2)
    println("=== learned merges (rank order) ===")
    println(merges.map { case (a, b) => s"""("$a", "$b")""" }
      .grouped(4).map(_.mkString(", ")).mkString(",\n"))

    // in-order single-pass replay, in-memory (the nested-replace mirror)
    def inOrder(w: String): Vector[String] = {
      var parts = w.map(_.toString).toVector
      for ((a, b) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < parts.length) {
          if (i < parts.length - 1 && parts(i) == a && parts(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += parts(i); i += 1 }
        }
        parts = out.result()
      }
      parts
    }

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val kernel = docs.select(col("doc_id"),
        Bpe.encode(GraftFunctions.tokens_lc(col("text")), merges))
        .as[(Long, Seq[String])].collect()
      val words = docs.select(col("doc_id"),
        GraftFunctions.tokens_lc(col("text"))).as[(Long, Seq[String])]
        .collect().toMap
      val bad = kernel.filter { case (id, enc) =>
        enc != words(id).flatMap(inOrder)
      }
      println(s"$sf: ${kernel.length} docs, canonical==in-order for all: " +
        s"${bad.isEmpty}" +
        (if (bad.nonEmpty) s" — MISMATCHES: ${bad.take(3).map(_._1).toSeq}" else ""))
    }
    spark.stop()
  }
}
