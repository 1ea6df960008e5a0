package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only edge-case probe: empty text, exact duplicates, sub-shingle-length
  * docs, null text through the dedup surface. */
object ProbeEdge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (2L, ""),                                            // empty
      (3L, ""),                                            // empty dup
      (4L, "one two"),                                     // < 3 tokens (sub-shingle)
      (5L, "!!! ??? ..."),                                 // punctuation only
      (6L, "the quick brown fox jumps over the lazy cat")  // near dup of 0
    ).toDF("doc_id", "text")
      .union(Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text"))

    import graft.ext.Dedup
    println("== exact (expect digest groups: {0,1}, {2,3}, singletons; null row behavior) ==")
    Dedup.exact(docs).orderBy("doc_id").show()
    println("== exactSurvivors ==")
    Dedup.exactSurvivors(docs).orderBy("doc_id").show()
    println("== minhashLsh pairs thr=0.5 (expect (0,1) j=1.0 and (0,6)/(1,6) high) ==")
    Dedup.minhashLshPairs(docs, threshold = 0.5).orderBy("id_a", "id_b").show()
    println("== simhash pairs hamming<=3 ==")
    Dedup.simhashPairs(docs, maxHamming = 3).orderBy("id_a", "id_b").show()

    import graft.ext.TextAnalysis
    val nonNull = docs.filter($"text".isNotNull)
    // NB: empty/sub-shingle docs produce NO shingles → invisible to
    // shingle-based near-dup (pairs require ≥3 tokens); exact dedup
    // catches them upstream. So {2,3} stay singletons here by design.
    println("== clusters over minhash pairs (expect {0,1,6}→0, rest singleton) ==")
    Dedup.connectedComponents(nonNull,
      Dedup.minhashLshPairs(nonNull, threshold = 0.5)).orderBy("doc_id").show()
    println("== chunking (empty doc → 1 empty chunk; short docs → 1 chunk) ==")
    TextAnalysis.chunkDocs(nonNull, chunkSize = 20, stride = 15)
      .orderBy("doc_id", "chunk_id").show(truncate = false)
    println("== repetition (empty/sub-shingle → 0.0) ==")
    TextAnalysis.repetition(nonNull).orderBy("doc_id").show()
    println("== scrub on punctuation-only / empty text (no-ops, zero counts) ==")
    TextAnalysis.scrubPii(nonNull).orderBy("doc_id").show(truncate = false)
    spark.stop()
  }
}
