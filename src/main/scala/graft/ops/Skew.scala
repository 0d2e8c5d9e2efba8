package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location helpers — the knobs that decide whether a join
  * survives a 100× scale-up (SURVEY.md §4).
  *
  * AQE's skew-join split (on by default in Spark 4) handles most runtime
  * skew; explicit salting remains necessary when a single key's rows exceed
  * what one task can hold even after AQE splitting (e.g. a null-key or
  * celebrity-key fact joined to a dimension).
  */
object Skew {

  /** Salted equi-join: fact keys get a deterministic salt in [0, buckets),
    * the (small) dimension side is exploded ×buckets, and the join runs on
    * (key, salt) — spreading one hot key over `buckets` reducers. Results
    * are identical to the unsalted join (verified by spec).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // The dim side is exploded ×buckets, so only fact-preserving join types
    // are equivalent to the unsalted join; right/full outer would emit
    // unmatched dim rows `buckets` times.
    require(Set("inner", "left", "left_outer")(joinType),
      s"saltedJoin supports inner/left only, got $joinType")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val expanded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Deterministic salt from row content (for reproducible tests): salts by
    * hashing the given columns instead of the physical row id.
    */
  def saltedJoinBy(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
                   saltCols: Seq[Column], joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer")(joinType),
      s"saltedJoinBy supports inner/left only, got $joinType")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(buckets)).cast("int"))
    val expanded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * shuffle-free (SortMergeJoin reads co-located buckets). This is the
    * reference's `repartitionBeforeWrite` intent (deltalake.ipynb:2913)
    * done properly: the layout, not the session, carries the partitioning.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
