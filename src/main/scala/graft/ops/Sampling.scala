package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling / splitting for training-data pipelines.
  * Everything is content-hash based (never `rand()`): reproducible across
  * runs, cluster sizes and partitionings — the property that matters when
  * a 100 TB corpus is re-split after a re-shard.
  */
object Sampling {

  /** Train/test split by 64-bit content hash: stable under repartitioning
    * and append-order changes. `pct` ∈ [0,100] is the train share.
    */
  def hashSplit(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.withColumn("is_train", pmod(xxhash64(col(idCol)), lit(100)) < pct)

  /** Modulo split — the reference's batch-splitting predicate
    * (`transaction_id % 5 == i`, deltalake.ipynb:2937–2938 cell 19) as a
    * split utility; weaker than hashSplit for skewed ids but exactly
    * reproducible in any SQL engine (used by the oracle).
    */
  def modSplit(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.withColumn("is_train", col(idCol) % 100 < pct)

  /** Exact per-group k-sample: deterministic "random" order via content
    * hash, row_number per group, keep ≤ k. One shuffle on the group key.
    */
  def stratifiedSampleExact(df: DataFrame, groupCol: String, idCol: String,
                            k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}
