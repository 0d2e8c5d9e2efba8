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

    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val l = left.withColumn("__tag", lit(1))
    val lAligned = payloadCols.zip(outNames).foldLeft(l) { case (df, (in, out)) =>
      df.withColumn(s"__p_$out", lit(null).cast(rightTypes(in)))
    }
    val r = right.withColumn("__tag", lit(0))
    val rAligned = payloadCols.zip(outNames).foldLeft(r) { case (df, (in, out)) =>
      df.withColumn(s"__p_$out", col(in))
    }
    // keep only key/time/tag/payload on the right; fill left-only columns null
    val leftOnly = left.columns.filter(c => c != key && c != time).toSeq
    val rUnion = leftOnly.foldLeft(
      rAligned.select((Seq(key, time, "__tag") ++ outNames.map("__p_" + _)).map(col): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(leftTypes(c)))
    }
    val lUnion = lAligned.select(
      (Seq(key, time, "__tag") ++ outNames.map("__p_" + _) ++ leftOnly).map(col): _*)

    val w = Window.partitionBy(key).orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = outNames.foldLeft(lUnion.unionByName(rUnion)) { (df, out) =>
      df.withColumn(s"__p_$out", last(col(s"__p_$out"), ignoreNulls = true).over(w))
    }
    val result = filled.filter(col("__tag") === 1).drop("__tag")
    outNames.foldLeft(result) { (df, out) =>
      df.withColumnRenamed(s"__p_$out", out)
    }
  }
}
