package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable DataSketches aggregates (Spark 4's Apache DataSketches
  * surface): KLL quantile sketches and Theta distinct-count sketches with
  * set algebra.
  *
  * Why these matter at 100 TB, beyond `approx_percentile` /
  * `approx_count_distinct` (q49): the sketch itself is a first-class BINARY
  * value. Per-partition / per-batch / per-day sketches can be persisted and
  * merged later WITHOUT rescanning the data — the same incremental-state
  * pattern as the corpus signature store — so daily corpus accounting
  * (token-length quantiles, distinct-doc counts, cross-source overlap)
  * costs one pass over the new batch, then driver-cheap merges. Theta
  * sketches additionally support union / intersection / difference, i.e.
  * "how many distinct customers does source A share with source B" without
  * a join.
  *
  * All estimates are engine-specific (seeded sketch internals) → rows-only
  * driver gates; SketchesSpec pins the estimates to their published error
  * bounds against exact answers, and pins the merge identity (sketch of
  * union == union of sketches) that the incremental pattern relies on.
  */
object Sketches {

  /** Per-group KLL quantile estimates for a double column: one mergeable
    * sketch per group (map-side partial agg, k=200 ≈ 1.65% rank error),
    * queried at the requested quantiles. Output: group, n, and one
    * `q<pct>` column per requested quantile.
    */
  def kllQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                   quantiles: Seq[Double]): DataFrame = {
    val sk = kll_sketch_agg_double(col(valueCol)).as("__sk")
    val base = df.groupBy(groupCol).agg(sk,
      count(lit(1)).as("n"))
    quantiles.foldLeft(base) { (acc, q) =>
      acc.withColumn(f"q${math.round(q * 100)}%02d",
        kll_sketch_get_quantile_double(col("__sk"), lit(q)))
    }.drop("__sk").orderBy(groupCol)
  }

  /** Per-group distinct-count estimate via Theta sketches. */
  def thetaDistinct(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(theta_sketch_estimate(theta_sketch_agg(col(keyCol)))
        .as("distinct_est"))
      .orderBy(groupCol)

  /** Distinct-count set algebra across two slices WITHOUT a join: sketch
    * each side's key column once, then estimate |A|, |B|, |A∪B|, |A∩B| and
    * |A\B| from the two sketches alone. At 100 TB the two scans are
    * embarrassingly parallel and the algebra is driver-free sketch math.
    */
  def thetaOverlap(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val sa = a.agg(theta_sketch_agg(col(keyCol)).as("ska"))
    val sb = b.agg(theta_sketch_agg(col(keyCol)).as("skb"))
    sa.crossJoin(sb).select(
      theta_sketch_estimate(col("ska")).as("n_a"),
      theta_sketch_estimate(col("skb")).as("n_b"),
      theta_sketch_estimate(theta_union(col("ska"), col("skb"))).as("n_union"),
      theta_sketch_estimate(theta_intersection(col("ska"), col("skb"))).as("n_intersect"),
      theta_sketch_estimate(theta_difference(col("ska"), col("skb"))).as("n_a_only"))
  }

  /** The incremental-accounting primitive: reduce per-batch THETA sketches
    * (a `binary` column, e.g. read back from a sketch store) to one
    * estimate — merging state instead of rescanning history.
    */
  def mergeThetaSketches(sketches: DataFrame, sketchCol: String): DataFrame =
    sketches.agg(
      theta_sketch_estimate(theta_union_agg(col(sketchCol), lit(12)))
        .as("distinct_est"))

  /** Per-batch sketch row ready for persisting into a sketch store:
    * (batchId, theta sketch of keys, KLL sketch of a measure, row count).
    */
  def batchSketch(df: DataFrame, batchId: String, keyCol: String,
                  measureCol: String): DataFrame =
    df.agg(
      theta_sketch_agg(col(keyCol)).as("key_sketch"),
      kll_sketch_agg_double(col(measureCol)).as("measure_sketch"),
      count(lit(1)).as("n"))
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "key_sketch", "measure_sketch", "n")
}
