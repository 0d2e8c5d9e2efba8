package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a cross product (the reference has
  * no range joins — SURVEY.md §2.3 — but event analytics needs them).
  *
  * Naive `points JOIN intervals ON t BETWEEN s AND e` plans as a
  * BroadcastNestedLoopJoin (quadratic). Instead both sides are mapped onto
  * coarse time buckets — intervals exploded across the buckets they span,
  * points to their single bucket — giving an equi-join on (key, bucket)
  * followed by the exact range filter. With bucket width chosen near the
  * typical interval length, each point meets only the handful of intervals
  * sharing its bucket: shuffle on (key, bucket), no explosion. This is the
  * standard bucketed range-join technique used by warehouse engines.
  */
object RangeJoin {

  /** Inner point-in-interval join: rows of `points` paired with every
    * interval of the same `key` whose [startCol, endCol) contains
    * `timeCol`. Interval bounds and the point time must be epoch seconds
    * (LongType); `bucketSeconds` is the bucketing granularity.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      timeCol: String, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    val p = points.withColumn("__bucket", floor(col(timeCol) / bucketSeconds))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketSeconds),
        floor((col(endCol) - 1) / bucketSeconds))))
    p.join(i, Seq(key, "__bucket"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bucket")
  }
}
