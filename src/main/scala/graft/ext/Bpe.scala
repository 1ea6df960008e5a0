package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/**
 * Byte-pair-encoding tokenizer training + inference (extension layer,
 * SURVEY.md §7.3) — the full tokenizer-training shape (Sennrich et al.,
 * "Neural Machine Translation of Rare Words with Subword Units", ACL
 * 2016): learn merges by iterated most-frequent-adjacent-pair counting
 * over a word-frequency table, then encode documents by replaying the
 * merges lowest-rank-first.
 *
 * Scale design:
 *  - training state is the WORD-FREQUENCY table (one corpus scan + one
 *    groupBy), vocabulary-sized, never corpus-sized — the classic BPE
 *    trainer shape;
 *  - each round is one partial-aggregable pair count over that table plus
 *    a ONE-ROW collect (the argmax pair) — model state, not data;
 *  - per-round lineage truncates through [[RoundCheckpointer]] (reliable
 *    checkpoint mode for cluster fault tolerance, same contract as
 *    [[Dedup.connectedComponents]]);
 *  - the learned table is metadata-sized and is baked into the
 *    [[graft.functions.BpeEncode]] codegen expression, so encoding is a
 *    pure shuffle-free projection over the corpus scan.
 *
 * Round count: with `batchSize = 1` (default) this is the EXACT
 * algorithm — one distributed round per merge. Production tokenizers
 * learn 30k+ merges; for that scale `batchSize > 1` takes the standard
 * engineering trade: each round selects up to `batchSize`
 * NON-CONFLICTING pairs (no shared symbols, no pair consuming another's
 * output token) from the round's count table and applies them together.
 * Disjointness makes the within-round application order-independent —
 * but a batch is an approximation of exact BPE: a round's 2nd-best pair
 * is taken against counts that ignore the 1st merge's newly-created
 * adjacencies. batchSize = 1 recovers exactness (pinned by BpeSpec).
 */
object Bpe {

  /** Ordered merge table: element i is the pair merged at rank i. */
  type Merges = Seq[(String, String)]

  /**
   * Learn `numMerges` BPE merges from the corpus. Deterministic: the
   * per-round argmax breaks count ties on (pair_left, pair_right)
   * ascending, so any run over the same corpus learns the same table.
   * Stops early when the best remaining pair occurs fewer than `minFreq`
   * times (weighted by word frequency).
   */
  def learnMerges(df: DataFrame, textCol: String = "text",
                  numMerges: Int = 32, minFreq: Long = 2,
                  checkpointDir: Option[String] = None,
                  batchSize: Int = 1): Merges =
    learnMergesFromWordFreq(
      df.select(explode(GraftFunctions.tokens_lc(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq")),
      numMerges, minFreq, checkpointDir, batchSize)

  /** [[learnMerges]] starting from an existing word-frequency table
    * (columns `w: string`, `freq: long`) — lets callers share one corpus
    * scan across the trainer and other vocabulary consumers, or learn
    * over a capped vocabulary. */
  def learnMergesFromWordFreq(wordFreq: DataFrame,
                              numMerges: Int = 32, minFreq: Long = 2,
                              checkpointDir: Option[String] = None,
                              batchSize: Int = 1): Merges = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val ck = new RoundCheckpointer(
      wordFreq.sparkSession.sparkContext, checkpointDir)
    // initial character symbols (1-based substring over non-empty
    // tokens; tokens_lc never emits empty strings)
    var words = ck.snap(
      wordFreq
        .select(col("freq"), expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms")))
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      // top pairs of the round — a bounded TakeOrdered collect (model
      // state): exactly the argmax for batchSize = 1, a small candidate
      // pool for the greedy non-conflicting selection otherwise
      val top = words.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(math.max(batchSize * 4, 1)).collect()
      // greedy selection: a pair conflicts if it shares a symbol with an
      // already-selected pair or touches one's output token — the
      // disjointness that makes within-round application commute
      val used = collection.mutable.Set.empty[String]
      val selected = collection.mutable.ArrayBuffer.empty[(String, String)]
      for (r <- top
           if selected.length < math.min(batchSize, numMerges - merges.length)
             && r.getLong(2) >= minFreq) {
        val (a, b) = (r.getString(0), r.getString(1))
        if (!used(a) && !used(b) && !used(a + b)) {
          selected += ((a, b))
          used ++= Seq(a, b, a + b)
        }
      }
      if (selected.isEmpty) done = true // best pair below minFreq (or none)
      else {
        merges ++= selected
        words = ck.snap(words.select(col("freq"),
          selected.foldLeft(col("syms")) { case (c, (a, b)) =>
            GraftFunctions.bpe_merge_pair(c, a, b)
          }.as("syms")))
        // snap is eager, so round N-1's snapshot has no later reader —
        // release it now (unlike connectedComponents, whose fixpoint
        // count still reads the previous round after snapping)
        ck.releasePrevious()
      }
    }
    // the result is driver-side model state — no DataFrame over the last
    // snapshot escapes, so ALL loop storage (checkpoint files or pinned
    // localCheckpoint blocks) can be released before returning
    ck.releaseAll()
    merges.toSeq
  }

  /** Merge one adjacent pair throughout a symbol vector (left-to-right,
    * non-overlapping) — the sequential analogue of the
    * `bpe_merge_pair` kernel. */
  private def mergeSeqLocal(syms: Vector[String], a: String,
                            b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /**
   * Sequential in-memory reference trainer (Sennrich 2016) over a
   * word-frequency table — the INDEPENDENT implementation the distributed
   * [[learnMerges]] (batchSize = 1) must reproduce exactly, including
   * count tie-breaks ((count desc, a, b) ascending). Two callers, same
   * contract: BpeSpec's fuzz property pins equality on random corpora,
   * and the declared `ext_bpe_learn` query recomputes it over the real
   * corpus's collected word-frequency table (vocabulary-sized — model
   * state, not corpus) so every verify run records the distributed ==
   * sequential verdict as data.
   */
  def learnMergesLocal(wordFreq: Map[String, Long], numMerges: Int,
                       minFreq: Long): Merges = {
    var vocab = wordFreq.map { case (w, f) =>
      w.map(_.toString).toVector -> f
    }.toSeq // distinct words stay distinct symbol vectors under merging
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minFreq) done = true
        else {
          merges += ((a, b))
          vocab = vocab.map { case (syms, f) => mergeSeqLocal(syms, a, b) -> f }
        }
      }
    }
    merges.toSeq
  }

  /** Subword stream of a document's token array under `merges` —
    * canonical lowest-rank-first inference, a codegen kernel. */
  def encode(tokens: Column, merges: Merges): Column =
    GraftFunctions.bpe_encode(tokens, merges)

  /** (id, n_tokens, n_bpe_tokens) per document — the count form used for
    * corpus budgeting. Shuffle-free: tokenize + encode are projections. */
  def encodeCounts(df: DataFrame, merges: Merges, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol),
      GraftFunctions.tokens_lc(col(textCol)).as("tk"))
      .select(col(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        size(encode(col("tk"), merges)).cast("long").as("n_bpe_tokens"))
}
