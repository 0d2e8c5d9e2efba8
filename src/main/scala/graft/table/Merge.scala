package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure MERGE plan rewrites — the reference's DeltaTable MERGE surface
  * (SURVEY.md §2.9, §7.4) re-expressed as deterministic join+union plans.
  * These are the *logical* halves; [[ManagedTable]] adds the transactional
  * write.
  *
  * Scale notes: the anti-join shuffles both sides on the merge key — at
  * 100 TB the source is normally a small delta batch, so Spark's AQE (or an
  * explicit `broadcast(source)`) turns the anti-join into a broadcast join
  * and the target never shuffles. `unionByName` is a zero-cost plan union.
  */
object Merge {

  /** MERGE upsert — `whenMatchedUpdateAll().whenNotMatchedInsertAll()`
    * (deltalake.ipynb:2939–2945 cell 19): source-wins union, i.e. keep
    * target rows whose key has no source match, then all source rows.
    * Precondition (same as the reference's merge): source has at most one
    * row per key.
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.join(source, keys, "left_anti").unionByName(source)

  /** MERGE insert-only — `whenNotMatchedInsertAll()` (deltalake.ipynb:
    * 1786–1791 cell 17): target plus source rows whose key is new.
    */
  def insertOnly(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(source.join(target, keys, "left_anti"))

  /** Incremental append with dedup on key (deltalake.ipynb:3227–3238
    * cell 20: existing-dates left-anti then append) — just the new rows.
    */
  def newRowsOnly(source: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    source.join(target, keys, "left_anti")

  /** SCD Type-2 apply: maintain a dimension with (valid_from, valid_to,
    * is_current) history columns. `changes` carries the new attribute
    * values with an effective timestamp column (same name as `effCol`):
    *  - keys present in `changes` close their current row
    *    (valid_to = effective ts, is_current = false) and gain a new
    *    current row;
    *  - unchanged keys pass through.
    * Precondition: one change row per key per batch (dedupe upstream).
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keys: Seq[String],
                effCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val changedKeys = changes.select(keys.map(col): _*).distinct()
    val untouched = dim.join(changedKeys, keys, "left_anti")
    val closed = dim.join(changes.select((keys.map(col) :+ col(effCol).as("__eff")): _*), keys)
      .filter(col("is_current"))
      .withColumn("valid_to", col("__eff"))
      .withColumn("is_current", lit(false))
      .drop("__eff")
    val stillHistoric = dim.join(changedKeys, keys, "left_semi")
      .filter(!col("is_current"))
    val opened = changes
      .withColumn("valid_from", col(effCol))
      .withColumn("valid_to", lit(null).cast(dim.schema("valid_to").dataType))
      .withColumn("is_current", lit(true))
      .drop(effCol)
      .select(dim.columns.map(col): _*)
    untouched.unionByName(stillHistoric).unionByName(closed).unionByName(opened)
  }

  /** CDC-style snapshot diff: classify rows of `after` vs `before` on
    * `keys` as inserted / deleted / updated / unchanged. One full-outer
    * join on the keys; value comparison via a hash over the non-key
    * columns (so wide rows don't shuffle twice).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val valCols = after.columns.filterNot(keys.contains).toSeq
    def hashed(df: DataFrame, h: String) =
      df.withColumn(h, xxhash64(valCols.map(col): _*))
    val b = hashed(before, "__hb").select((keys.map(col) :+ col("__hb")): _*)
    val a = hashed(after, "__ha")
    a.join(b, keys, "full_outer")
      .withColumn("change_type",
        when(col("__hb").isNull, "insert")
          .when(col("__ha").isNull, "delete")
          .when(col("__ha") === col("__hb"), "unchanged")
          .otherwise("update"))
      .drop("__ha", "__hb")
  }

  /** High-water-mark detection (M4, deltalake.ipynb:1497–1502 cell 15):
    * rows of `df` strictly above the max of `watermarkCol` in `existing`.
    * Expressed as a plan (cross join with the 1-row max, auto-broadcast)
    * rather than a driver-side collect, so it composes lazily.
    */
  def aboveHighWaterMark(df: DataFrame, existing: DataFrame, watermarkCol: String): DataFrame = {
    val hwm = existing.agg(max(col(watermarkCol)).as("__hwm"))
    // null high-water mark (empty `existing`) means everything is new
    df.join(broadcast(hwm),
      col(watermarkCol) > col("__hwm") || col("__hwm").isNull).drop("__hwm")
  }
}
