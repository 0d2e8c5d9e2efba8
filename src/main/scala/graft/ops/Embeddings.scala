package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational.dsum

/** Embedding-column analytics beyond search: per-label centroids and
  * centroid-based assignment — the building blocks of clustering /
  * classification passes over a 100 TB embedding store.
  *
  * Centroids use posexplode + (label, pos) hash aggregation: fully
  * codegen'd, map-side combinable, and shuffling only (labels × dims)
  * aggregated cells — never whole vectors. Sums go through the DECIMAL
  * determinism contract so the DuckDB oracle matches bit-exactly.
  */
object Embeddings {

  /** Per-label per-dimension centroid components (long form: label, pos,
    * c). 1-based pos to match SQL array indexing in the oracle.
    */
  def centroidComponents(embeddings: DataFrame, labelCol: String,
                         vecCol: String): DataFrame =
    embeddings
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("pos", (col("pos") + 1).cast("long"))
      .groupBy("label", "pos")
      .agg((dsum(col("x").cast("double")) / count(lit(1))).as("c"))

  /** Centroids re-assembled as vectors (label, centroid array<double>). */
  def centroids(embeddings: DataFrame, labelCol: String, vecCol: String): DataFrame =
    centroidComponents(embeddings, labelCol, vecCol)
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"), transform(col("pc"), p => p.getField("c")).as("centroid"))

  /** Symmetric int8 scalar quantization (long form: id, pos, q) — the 4×
    * storage cut for a 100 TB embedding store. q = floor(x·127/amax + 0.5):
    * floor-plus-half instead of round() because double round() half-cases
    * are not portable across engines, floor is. 1-based pos (SQL array
    * convention, as [[centroidComponents]]).
    */
  def quantizeInt8(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val amax = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    embeddings
      .withColumn("__amax", amax)
      .select(col(idCol), col("__amax"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("pos"),
        when(col("__amax") === 0.0, lit(0))
          .otherwise(floor(col("x").cast("double") * 127.0 / col("__amax") + 0.5))
          .cast("int").as("q"))
  }

  /** Assign each vector to the nearest centroid by cosine (broadcast the
    * centroid table; linear scan, no shuffle).
    */
  def assignToCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                        cents: DataFrame): DataFrame = {
    // embeddings may carry its own `label`; keep the centroid's distinct
    val c = cents.select(col("label").as("__clabel"), col("centroid"))
    val scored = embeddings.join(broadcast(c))
      .select(col(idCol), col("__clabel"),
        Similarity.cosine(col(vecCol), col("centroid")).as("cos_sim"))
    Relational.topKPerGroup(scored, idCol, 1, "cos_sim", "__clabel")
      .select(col(idCol), col("__clabel").as("assigned_label"), col("cos_sim"))
  }
}
