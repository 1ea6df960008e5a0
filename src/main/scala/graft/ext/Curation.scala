package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.GraftFunctions
import graft.ops.Caching

/**
 * Corpus-curation operators beyond dedup proper (extension layer,
 * SURVEY.md §7.3): repeated-span boilerplate stripping, Bloom-prefiltered
 * exact decontamination, and reference-corpus bigram fit scoring — the
 * RefinedWeb/CCNet-shaped cleaning steps of an LLM data pipeline.
 *
 * 100 TB design rules (same contract as [[Dedup]]):
 *  - join/group keys are fixed-width `xxhash64` digests, never raw text;
 *  - no forced broadcasts of corpus-growing sides — AQE decides;
 *  - aggregations are partial-aggregable; no `collect()` on data paths
 *    (the one driver transfer here is the serialized Bloom filter —
 *    model-state-sized, like the IVF quantizer in [[Similarity]]).
 */
object Curation {

  /**
   * Repeated-chunk boilerplate stripping (the line-dedup of
   * RefinedWeb/C4, adapted to unstructured text): split each document
   * into consecutive non-overlapping `chunkWords`-word windows, count
   * each chunk's document frequency corpus-wide, drop every chunk that
   * appears in at least `maxDf` distinct documents, and reassemble the
   * surviving chunks in order.
   *
   * Returns (idCol, text_clean, n_kept, n_dropped) with one row per
   * input document (fully-stripped documents keep an empty string).
   *
   * Scale shape: one tokenize+chunk scan, persisted (spillable) because
   * the frequency count and the reassembly both consume it; the
   * frequency join is on the 8-byte `xxhash64(chunk)` (collision odds
   * ~2^-64 per distinct-chunk pair — the DuckDB oracle joins raw chunk
   * text and has never diverged); the repeated-chunk set is NOT
   * broadcast by hint — boilerplate is small in practice but grows
   * adversarially with the corpus, so AQE decides at runtime. The
   * reassembly shuffle is keyed by document id (bounded rows per key).
   */
  def repeatedChunkStrip(docs: DataFrame, chunkWords: Int = 10,
                         maxDf: Int = 2, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(chunkWords > 0 && maxDf >= 2, "need chunkWords > 0, maxDf >= 2")
    val w = chunkWords
    val base = docs.select(col(idCol),
      GraftFunctions.tokens_lc(col(textCol)).as("__tk"))
      .withColumn("__n",
        ceil(size(col("__tk")) / lit(w.toDouble)).cast("int"))
    // sequence(0, n-1) is only valid for n >= 1; zero-chunk docs rejoin
    // at the end via the left join from the id spine.
    val chunks = Caching.register(base.filter(col("__n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0), col("__n") - 1)).as("pos"), col("__tk"))
      .select(col(idCol), col("pos"),
        array_join(slice(col("__tk"), col("pos") * w + 1, lit(w)), " ")
          .as("chunk")))
    val repeated = chunks
      .groupBy(xxhash64(col("chunk")).as("chk"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= maxDf)
      .select(col("chk"), lit(true).as("__rep"))
    val re = chunks.withColumn("chk", xxhash64(col("chunk")))
      .join(repeated, Seq("chk"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__rep").isNull, struct(col("pos"), col("chunk"))))),
          c => c.getField("chunk"))).as("text_clean"),
        count(when(col("__rep").isNull, 1)).as("n_kept"),
        count(col("__rep")).as("n_dropped"))
    docs.select(col(idCol)).join(re, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** `might_contain(bloom, xxhash64(textCol))` as a codegen'd Catalyst
    * predicate — the probe side of [[bloomDecontaminate]], exposed for
    * tests. */
  private[ext] def mightContain(bloomBytes: Array[Byte], textCol: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, org.apache.spark.sql.types.BinaryType),
      Bridge.expression(xxhash64(textCol))))

  /**
   * Exact-text decontamination with a Bloom-filter prefilter: documents
   * whose text appears verbatim in `heldOut` are dropped, but the
   * corpus-vs-heldout comparison only pays a join for the (tiny)
   * fraction of documents the Bloom filter cannot rule out.
   *
   * The filter is built over `xxhash64(text)` of the held-out set with
   * Spark's own `BloomFilterAggregate` (the runtime-filtering kernel)
   * and evaluated per-row with the codegen'd `BloomFilterMightContain` —
   * a compact bitset (model-state-sized: ~1.2 MB at 1M items / 1 % fpp)
   * carried to executors as a literal, like a broadcast dim. False
   * positives are removed by an exact semi-join on raw text over the
   * candidates only, so the RESULT is exact — identical to
   * `Queries.ext_decontaminate` — while the corpus side never shuffles:
   * the clean branch is a pure filter scan, and the verify branch's left
   * side is Bloom-hits only.
   *
   * Trade-off (documented, not hidden): the union evaluates the corpus
   * scan twice. For a parquet-backed corpus two narrow columnar scans
   * are far cheaper at 100 TB than one full-corpus shuffle; if the
   * corpus is an expensive upstream computation, persist it first.
   */
  def bloomDecontaminate(corpus: DataFrame, heldOut: DataFrame,
                         textCol: String = "text",
                         expectedItems: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(textCol))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // One row, model-state-sized (the serialized bitset) — the same
    // driver-transfer class as the IVF quantizer (Similarity.scala:84).
    val bloomBytes = heldOut.select(Bridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    // Empty held-out set → the aggregate returns null (no filter was
    // built) → nothing is contaminated. Without this guard the null
    // predicate would silently drop the WHOLE corpus from both branches.
    if (bloomBytes == null) return corpus
    val mc = mightContain(bloomBytes, col(textCol))
    // Null-text rows survive exactly: `xxhash64(null)` is the SEED (42),
    // not null, so `mc` is always a real boolean — a null-text corpus row
    // either misses the filter (clean branch) or, when a held-out
    // null-text row inserted 42 into it, lands in the verify branch where
    // the null join key matches nothing and the left_anti keeps it.
    val clean = corpus.filter(!mc)
    val verified = corpus.filter(mc)
      .join(heldOut.select(col(textCol)).distinct(), Seq(textCol), "left_anti")
    clean.unionByName(verified)
  }

  /**
   * Reference-corpus bigram fit score (the CCNet quality-bucketing
   * signal, kept in exact integer arithmetic instead of log-space so
   * the score is engine-exact): every corpus document is scored by how
   * often its word bigrams occur in a reference corpus —
   * `ref_hits = Σ ref_count(bigram)` and `score = ref_hits / n_bigrams`
   * (one double division; both operands exact integers).
   *
   * Returns (idCol, ref_hits, n_bigrams, ref_score) with one row per
   * corpus document (documents with fewer than two tokens score 0).
   *
   * Scale shape: the model is `(xxhash64(bigram), count)` from one
   * partial-aggregable pass over the reference; the corpus joins on the
   * fixed-width hash with no broadcast hint (reference corpora are
   * usually small — AQE broadcasts then — but nothing breaks when the
   * reference grows); the per-document sum is partial-aggregable.
   */
  def bigramRefScore(corpus: DataFrame, ref: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    def bigramRows(df: DataFrame): DataFrame = {
      val tk = GraftFunctions.tokens_lc(col(textCol))
      df.select(col(idCol), tk.as("__tk"))
        .filter(size(col("__tk")) >= 2)
        .select(col(idCol),
          explode(zip_with(
            slice(col("__tk"), lit(1), size(col("__tk")) - 1),
            slice(col("__tk"), lit(2), size(col("__tk")) - 1),
            (a, b) => concat(a, lit(" "), b))).as("bg"))
        .select(col(idCol), xxhash64(col("bg")).as("bgk"))
    }
    val model = bigramRows(ref)
      .groupBy(col("bgk")).agg(count(lit(1)).as("__cnt"))
    val scored = bigramRows(corpus)
      .join(model, Seq("bgk"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("__cnt")), lit(0L)).as("ref_hits"),
        count(lit(1)).as("n_bigrams"))
    corpus.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("ref_hits"), lit(0L)).as("ref_hits"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("ref_hits").cast("double") /
            col("n_bigrams").cast("double")).as("ref_score"))
  }

  /**
   * Persist the decontamination model: the serialized Bloom filter over
   * `xxhash64(text)` plus the DISTINCT sha2-256 digests of the held-out
   * texts. The held-out set is static (an eval benchmark changes
   * rarely); every weekly crawl probes the STORED filter instead of
   * re-aggregating it — the same build-once/probe-many contract as the
   * dedup and IVF indexes. Layout under `path`:
   *   `bloom/`   — one row, the filter bytes (model-state-sized)
   *   `digests/` — (digest) parquet, one row per distinct held-out text
   * An EMPTY held-out set writes no bloom row; probes then return the
   * corpus unchanged (nothing can be contaminated).
   */
  def buildBloomIndex(heldOut: DataFrame, path: String,
                      textCol: String = "text",
                      expectedItems: Long = 1000000L,
                      fpp: Double = 0.01): Unit = {
    val spark = heldOut.sparkSession
    import spark.implicits._
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(textCol))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bloomBytes = heldOut.select(Bridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    (if (bloomBytes == null) Seq.empty[Array[Byte]] else Seq(bloomBytes))
      .toDF("bf").repartition(1)
      .write.mode("overwrite").parquet(s"$path/bloom")
    heldOut.select(sha2(col(textCol), 256).as("digest")).distinct()
      .write.mode("overwrite").parquet(s"$path/digests")
  }

  /** [[bloomDecontaminate]] against a persisted filter: probe the STORED
    * bitset (still a codegen predicate over one corpus scan — the bytes
    * load once, metadata-sized), and exact-verify Bloom hits against the
    * STORED digest table — a fixed-width 32-byte anti-join, never a
    * raw-text join. Exact up to sha2-256 collisions, the same digest
    * contract as the declared `ext_decontaminate`. */
  def bloomDecontaminateFromIndex(corpus: DataFrame, path: String,
                                  textCol: String = "text"): DataFrame = {
    val spark = corpus.sparkSession
    val bloomRows = spark.read.parquet(s"$path/bloom").collect()
    if (bloomRows.isEmpty) return corpus
    val bloomBytes = bloomRows.head.getAs[Array[Byte]](0)
    val mc = mightContain(bloomBytes, col(textCol))
    val digests = spark.read.parquet(s"$path/digests")
    val clean = corpus.filter(!mc)
    val verified = corpus.filter(mc)
      .withColumn("__dg", sha2(col(textCol), 256))
      .join(digests.withColumnRenamed("digest", "__dg"), Seq("__dg"), "left_anti")
      .drop("__dg")
    clean.unionByName(verified)
  }

  /**
   * Per-source quality cap (the C4/RefinedWeb domain-frequency rule
   * generalized to "keep the BEST `maxPerSource` documents of every
   * source"): rank each source's documents by `quality` descending
   * (ties by ascending id — fully deterministic at any parallelism) and
   * keep the top `maxPerSource`. A single hash exchange on the source
   * key; the rank filter plans as WindowGroupLimit, so each task keeps
   * at most `maxPerSource` rows per source BEFORE the shuffle — the
   * window never materializes a whole mega-domain (the Zipf-head
   * blogspot/wordpress case that makes naive per-domain windows fall
   * over at crawl scale).
   *
   * Returns (idCol, sourceCol, quality, rank_in_source) for the kept
   * rows.
   */
  def sourceQualityCap(docs: DataFrame, quality: Column, maxPerSource: Int,
                       idCol: String = "doc_id",
                       sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(sourceCol)
      .orderBy(col("quality").desc, col(idCol))
    docs.select(col(idCol), col(sourceCol), quality.as("quality"))
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .filter(col("rank_in_source") <= maxPerSource)
  }

  /**
   * Snapshot diff between two corpus versions keyed by id: per-document
   * status `added` (id only in `newer`), `removed` (only in `old`),
   * `changed` (both, content digest differs), `unchanged`. The compare
   * is on sha2-256 digests, never raw text — a full-outer join on the
   * fixed-width id with 32-byte payloads, so the diff of two 100 TB
   * snapshots shuffles ~40 bytes per document. The release-gate audit
   * ("what changed since the last training set?") every versioned-corpus
   * pipeline needs.
   */
  def corpusDiff(old: DataFrame, newer: DataFrame,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    // presence markers, NOT digest-nullness: sha2(null text) is null, and
    // inferring absence from it would misclassify a null-text document as
    // added/removed. A null digest on either side of a present-present
    // pair compares as not-equal → "changed" (conservative: re-process).
    val o = old.select(col(idCol), sha2(col(textCol), 256).as("__od"),
      lit(true).as("__op"))
    val n = newer.select(col(idCol), sha2(col(textCol), 256).as("__nd"),
      lit(true).as("__np"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(col("__od") === col("__nd"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /**
   * Temperature-flattened mixture sampling (the multilingual/domain
   * rebalancing rule of multilingual-LM training — sampling probability
   * ∝ n_g^α with α = 0.5, i.e. `sqrt`): each group g of size n_g gets an
   * expected share of `targetDocs` proportional to √n_g, so head groups
   * are downweighted and tail groups upweighted relative to their raw
   * frequency. Per-document keep rate:
   *
   *   rate_g = min(1, targetDocs · √n_g / Σ_h √n_h / n_g)
   *
   * The keep decision is the overflow-safe limb hash of the id against
   * `floor(rate · 2^32)` — deterministic at any parallelism, no RNG
   * state, reproducible across engines (α is FIXED at 0.5 because
   * `sqrt` is IEEE-exact in both Spark and the DuckDB oracle; a general
   * `pow(n, α)` is not). The per-group weight √n_g is rounded to exact
   * integer micro-units BEFORE the cross-group sum: a double Σ√n_g
   * depends on reduction order (different per engine and per partition
   * layout), while the integer sum is order-free — the same rule as the
   * integer-nanos means elsewhere in this codebase. Scale shape: one
   * metadata-sized group-count aggregate broadcast back; the data path
   * is a narrow filter scan.
   *
   * `hash` must be the precomputed keep-decision hash column (the
   * caller's limb hash of its id column, value in [0, 2^32)).
   */
  def temperatureMixture(docs: DataFrame, hash: Column, targetDocs: Double,
                         groupCol: String = "lang"): DataFrame = {
    val counts = docs.groupBy(groupCol)
      .agg(count(lit(1)).as("n_g"))
      .select(col(groupCol), col("n_g"),
        floor(sqrt(col("n_g").cast("double")) * 1000000L + 0.5)
          .cast("long").as("w_g"))
    val tot = counts.agg(sum(col("w_g")).as("sum_w"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(groupCol).as("__g"),
        least(lit(1.0),
          lit(targetDocs) * col("w_g").cast("double") /
            col("sum_w").cast("double") / col("n_g").cast("double"))
          .as("__rate"))
    // null-SAFE join: groupBy above keeps a null group (it holds weight
    // in sum_w), so the rate join must match it too — a plain equi-join
    // would silently drop every null-group document while still charging
    // that group's weight against the budget
    docs.join(broadcast(rates), docs(groupCol) <=> rates("__g"))
      .filter(hash < floor(col("__rate") * 4294967296L).cast("long"))
      .drop("__g", "__rate")
  }
}
