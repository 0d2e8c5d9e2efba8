package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-quality operators: per-column statistics and declarative
  * constraint checking — the validation pass a training pipeline runs
  * before consuming a 100 TB corpus. Both are single-pass aggregations
  * (one scan, map-side combinable, no shuffle beyond the final reduce).
  */
object Quality {

  /** ANALYZE-style per-column stats in one scan: nulls, distinct
    * (approx for scale), min/max for numeric columns. Output long-form:
    * (column, n_nulls, approx_distinct, min_val, max_val).
    */
  def columnStats(df: DataFrame): DataFrame = {
    val total = count(lit(1))
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(s"`${f.name}`")
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nulls_${f.name}"),
        approx_count_distinct(c).as(s"__dist_${f.name}")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            min(c).cast("double").as(s"__min_${f.name}"),
            max(c).cast("double").as(s"__max_${f.name}"))
          case _ => Seq(
            lit(null).cast("double").as(s"__min_${f.name}"),
            lit(null).cast("double").as(s"__max_${f.name}"))
        })
    }
    val row = df.agg(total.as("__total"), aggs: _*)
    // backticked resolution: a source column named with a dot (legal,
    // common in ingested JSON) would otherwise make col() parse the alias
    // as a struct-field access and fail the whole stats pass
    def q(n: String) = col(s"`$n`")
    val perCol = df.schema.fields.map { f =>
      struct(lit(f.name).as("column"),
        q(s"__nulls_${f.name}").as("n_nulls"),
        q(s"__dist_${f.name}").as("approx_distinct"),
        q(s"__min_${f.name}").as("min_val"),
        q(s"__max_${f.name}").as("max_val"))
    }
    row.select(col("__total").as("n_rows"), explode(array(perCol: _*)).as("s"))
      .select(col("s.column"), col("n_rows"), col("s.n_nulls"),
        col("s.approx_distinct"), col("s.min_val"), col("s.max_val"))
  }

  /** Declarative constraints: each (name, predicate) is counted in ONE
    * aggregation pass; output (constraint, n_rows, n_violations, pass).
    *
    * Null semantics: a predicate that evaluates to NULL is a PASS, not a
    * violation — only rows where the condition is definitively false count.
    * (This matches SQL `CASE WHEN NOT cond THEN 1 ELSE 0 END` and the q70
    * oracle; add an explicit `isNotNull` constraint to treat nulls as bad.)
    */
  /** Quarantine split — the enforcement form of [[check]]: rows violating
    * any constraint land in the `bad` frame tagged with the comma-joined
    * names of their violated constraints (declaration order); everything
    * else passes through untouched. Same null semantics as [[check]]
    * (NULL predicate = pass). One pass, pure expressions — the split is
    * two filters over the same scan, no shuffle.
    */
  def quarantine(df: DataFrame,
                 constraints: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    // concat_ws skips nulls, so each satisfied constraint contributes nothing
    val reasons = concat_ws(",",
      constraints.map { case (name, cond) => when(!cond, lit(name)) }: _*)
    val tagged = df.withColumn("violations", reasons)
    (tagged.filter(col("violations") === "").drop("violations"),
      tagged.filter(col("violations") =!= ""))
  }

  def check(df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    val aggs = constraints.map { case (name, cond) =>
      sum(when(!cond, 1L).otherwise(0L)).as(s"__v_$name")
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perC = constraints.map { case (name, _) =>
      struct(lit(name).as("constraint"), col(s"__v_$name").as("n_violations"))
    }
    row.select(col("__n").as("n_rows"), explode(array(perC: _*)).as("s"))
      .select(col("s.constraint"), col("n_rows"), col("s.n_violations"),
        (col("s.n_violations") === 0L).as("pass"))
  }
}
