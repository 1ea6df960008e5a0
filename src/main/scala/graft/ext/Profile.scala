package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shared corpus/embedding profiling aggregations — ONE implementation
 * consumed by both the declared oracled queries (`ext_dup_histogram`,
 * `ext_embed_profile`) and [[graft.jobs.AuditJob]], so a semantics fix
 * lands everywhere at once.
 */
object Profile {

  /** Duplicate-cluster size histogram: exact-digest cluster sizes →
    * clusters per size. The digest groupBy is the only corpus-wide
    * shuffle; the histogram itself is metadata-sized. */
  def dupHistogram(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("dg"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))

  /** Per-label embedding profile: counts, dim bounds, zero-vector count,
    * and the mean-norm numerator via the exact integer-nanos pattern
    * (per-row round, order-free integer sum — engine- and layout-exact).
    * An empty array folds to n2 = 0.0 (counted as a zero vector — the
    * DuckDB oracle mirrors this with a coalesce, since `list_sum([])`
    * is NULL there). */
  def embedProfile(emb: DataFrame, labelCol: String = "label",
                   vecCol: String = "embedding"): DataFrame = {
    val n2 = aggregate(col(vecCol), lit(0.0d),
      (a, x) => a + x.cast("double") * x.cast("double"))
    emb.select(col(labelCol), n2.as("n2"), size(col(vecCol)).as("dim"))
      .groupBy(labelCol)
      .agg(count(lit(1)).as("n_vecs"),
        min("dim").cast("long").as("min_dim"),
        max("dim").cast("long").as("max_dim"),
        sum(floor(sqrt(col("n2")) * 1000000000L + 0.5).cast("long"))
          .as("norm_nanos"),
        sum(when(col("n2") === 0.0d, 1L).otherwise(0L)).as("n_zero"))
  }
}
