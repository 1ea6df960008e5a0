package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine_sim
import graft.functions.TopKByScore.top_k_by

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (extension layer, SURVEY.md §7.3).
 *
 * Scale design: the query set is broadcast (it is the small side by
 * construction); the corpus is scanned once; per-group top-k uses the
 * bounded-heap `TopKByScore` aggregate, so partial aggregation keeps at
 * most k candidates per partition per query and only O(k) rows cross the
 * shuffle — never `collect_list` of the whole corpus.
 */
object Similarity {

  /** Exact brute-force cosine top-k: one corpus scan per query batch.
    * Output: (query_id, neighbor_id, score) — k rows per query,
    * self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
    c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosine_sim(col("q_vec"), col("c_vec")).as("score"))
      .groupBy("query_id")
      .agg(top_k_by(col("score"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"))
  }

  /**
   * IVF-style ANN: partition the corpus into Voronoi cells of a coarse
   * quantizer (IVF-Flat, cf. Jégou et al., "Product Quantization for
   * Nearest Neighbor Search", TPAMI 2011 — inverted-list part only, no PQ
   * compression); queries probe the `nprobe` nearest cells.
   *
   * The coarse quantizer here is a deterministic sample of the corpus
   * (every `centroidStride`-th id) — at real scale it would be k-means
   * trained offline; the plumbing (assign via broadcast join + max_by,
   * probe-bucket join, bounded top-k) is identical.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              centroidStride: Int = 50, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = corpus.filter(col(idCol) % centroidStride === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))

    // invert: each corpus vector → nearest centroid (broadcast join; the
    // quantizer is small by construction)
    val assigned = corpus
      .select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
      .join(broadcast(cents))
      .select(col("cand_id"), col("c_vec"), col("cent_id"),
        cosine_sim(col("c_vec"), col("cent_vec")).as("cscore"))
      .groupBy("cand_id")
      .agg(max_by(col("cent_id"), col("cscore")).as("bucket"),
        first(col("c_vec")).as("c_vec"))

    // probe lists: nprobe nearest centroids per query
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .join(broadcast(cents))
      .select(col("query_id"), col("q_vec"), col("cent_id"),
        cosine_sim(col("q_vec"), col("cent_vec")).as("cscore"))
      .groupBy("query_id")
      .agg(top_k_by(col("cscore"), col("cent_id").cast("long"), nprobe).as("pl"),
        first(col("q_vec")).as("q_vec"))
      .select(col("query_id"), col("q_vec"), explode(col("pl.id")).as("bucket"))

    // search only the probed buckets
    probes.join(assigned, Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosine_sim(col("q_vec"), col("c_vec")).as("score"))
      .groupBy("query_id")
      .agg(top_k_by(col("score"), col("cand_id"), k).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("hit"))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"))
  }
}
