package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-at-or-before) join — the reference has no as-of join
  * (SURVEY.md §2.3 note), but event/rates pipelines need it constantly
  * (e.g. "value of the rate table as of each transaction's timestamp").
  *
  * Implemented Spark-first as the union + keyed-window trick (preference
  * order (a) from the build brief — composition of built-ins, no custom
  * plan node):
  *
  *   1. tag both sides, unionByName on (key, time) with right-side payload
  *   2. one window per key ordered by (time, tag): `last(payload,
  *      ignoreNulls)` over unbounded-preceding forward-fills the latest
  *      right-side payload onto every left row
  *   3. keep left rows
  *
  * Cost: ONE shuffle on the key (same as any keyed window); no range
  * explosion, no per-row binary search. Skewed keys behave like any
  * window partition (AQE does not split windows — for a pathological key,
  * pre-bucket by coarse time first). Right rows at exactly t match
  * (at-or-before semantics): the tag orders right before left at equal t.
  */
object AsOf {

  /** Left as-of join: every `left` row gets the most recent `right` payload
    * with `right.time <= left.time`, matching on `key`. Right-side payload
    * columns are suffixed with `rightSuffix` if they collide.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               rightSuffix: String = "_asof"): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != time).toSeq
    val outNames = payloadCols.map(c =>
      if (left.columns.contains(c)) c + rightSuffix else c)

    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    // the payload forward-fills as ONE struct — the whole latest right row
    // wins atomically. Filling each column independently would let a
    // legitimately-NULL field in the newest right row inherit a stale
    // value from an older row, fabricating a (col1, col2) combination
    // that never existed in the right table.
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => payloadCols.contains(f.name)))

    val leftOnly = left.columns.filter(c => c != key && c != time).toSeq
    val lUnion = left.withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select((Seq(key, time, "__tag", "__p") ++ leftOnly).map(col): _*)
    val rUnion = leftOnly.foldLeft(
      right.withColumn("__tag", lit(0))
        .withColumn("__p", struct(payloadCols.map(col): _*))
        .select(Seq(key, time, "__tag", "__p").map(col): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(leftTypes(c)))
    }

    val w = Window.partitionBy(key).orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lUnion.unionByName(rUnion)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val result = filled.filter(col("__tag") === 1).drop("__tag")
    payloadCols.zip(outNames).foldLeft(result) { case (df, (in, out)) =>
      df.withColumn(out, col("__p").getField(in))
    }.drop("__p")
  }
}
