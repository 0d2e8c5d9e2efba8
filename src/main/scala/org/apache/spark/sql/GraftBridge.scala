package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's package-private Column ↔ Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose a
  * custom Catalyst expression as a user-facing Column. This is the Spark 4
  * equivalent of the old public `new Column(expr)` / `col.expr` API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-tag a batch plan as a streaming micro-batch frame — what a V1
    * `Source.getBatch` must return (the engine asserts `isStreaming`).
    * Same package-private `internalCreateDataFrame` the built-in file
    * stream source uses; the RDD stays lazy, nothing materializes here.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse re-tag: wrap a streaming micro-batch's physical RDD as a
    * BATCH frame so it can feed a batch writer (the V1 sink idiom — the
    * incoming `addBatch` DataFrame carries a streaming-internal plan that
    * batch actions reject). Stays lazy and fully distributed.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
