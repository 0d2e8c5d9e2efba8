package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-skew guard for CPU-bound per-row expansions (optimization guide
  * §2.5): a small parquet file scans as ONE partition (a 128 MB split
  * swallows it whole), and an explode/hash/shingle pipeline inheriting
  * that layout runs single-threaded while the rest of the machine idles —
  * the profile showed q97's trigram explode as one 1.9 s task with 31
  * cores idle. Repartitioning costs one exchange of the narrow projection,
  * and only fires when the source has fewer partitions than the cluster
  * has slots; at 100 TB scans arrive thousands of partitions wide and this
  * is a no-op (no exchange added).
  *
  * Results are unaffected: every consumer aggregates with
  * partitioning-invariant sums/counts/mins (the repo-wide DECIMAL/integer
  * discipline), so the round-robin layout never reaches an answer.
  */
private[graft] object Spread {
  def toCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
