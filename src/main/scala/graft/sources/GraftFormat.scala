package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode,
  SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.table.ManagedTable

/** `format("graft")` — the managed table as a first-class Spark data
  * source name (Delta's `format("delta")` role, deltalake.ipynb:498's
  * write surface), wired through the STABLE v1 source SPI:
  *
  * {{{
  * df.write.format("graft").mode("append").save("/data/t")       // batch
  * df.write.format("graft").option("partitionBy", "day").save(p) // layout
  * spark.read.format("graft").load("/data/t")                    // scan
  * df.writeStream.format("graft")                                // sink
  *   .option("checkpointLocation", cp).start("/data/t")
  * }}}
  *
  * The streaming sink is EXACTLY-ONCE by construction: each micro-batch
  * routes through [[ManagedTable.appendIdempotent]] keyed on the sink's
  * checkpoint identity and `batchId` — a replayed batch after a crash is
  * a metadata no-op, the same txn discipline Delta's streaming sink uses.
  * The batch stays a lazy distributed plan end to end
  * ([[org.apache.spark.sql.GraftBridge.asBatch]]); nothing collects.
  *
  * Batch reads go through [[GraftRelation]] — a PrunedFilteredScan whose
  * inner plan IS `table.read` with the pruned columns selected and the
  * pushed filters applied, so deletion vectors, shallow-clone resolution
  * and protocol gates all engage, column pruning reaches the parquet
  * `ReadSchema`, and pushable predicates reach `PushedFilters` inside the
  * delegate scan. (`ManagedTable.read` remains the primary API; the
  * format is the spark-idiomatic spelling of the same plan.)
  */
class GraftFormat extends CreatableRelationProvider with RelationProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft format needs a path: .save(path) / .load(path) / .start(path)"))

  // ---- batch write ------------------------------------------------------

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val p = path(parameters)
    val t = new ManagedTable(sqlContext.sparkSession, p)
    val pcs = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val evolve = parameters.get("mergeSchema").exists(_.equalsIgnoreCase("true"))
    mode match {
      case SaveMode.Append => t.append(data, pcs, allowEvolution = evolve)
      case SaveMode.Overwrite => t.overwrite(data, pcs)
      case SaveMode.ErrorIfExists =>
        if (t.exists) throw new IllegalStateException(s"table exists: $p")
        else t.overwrite(data, pcs)
      case SaveMode.Ignore => if (!t.exists) t.overwrite(data, pcs)
    }
    GraftRelation(sqlContext.sparkSession, p)
  }

  // ---- batch read -------------------------------------------------------

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftRelation(sqlContext.sparkSession, path(parameters))

  // ---- streaming sink ---------------------------------------------------

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append() ||
        outputMode == OutputMode.Update(),
      s"graft sink supports Append/Update output modes, got $outputMode")
    val p = path(parameters)
    // the appId ties replays of THIS query to its batches: the checkpoint
    // location is the query's durable identity (Delta keys its sink txn
    // the same way); a fresh checkpoint = a fresh query = fresh batch ids
    val appId = "graft-sink-" + parameters.getOrElse("checkpointLocation", p)
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit =
        new ManagedTable(data.sparkSession, p).appendIdempotent(
          org.apache.spark.sql.GraftBridge.asBatch(data),
          appId, batchId, partitionColumns)
      override def toString: String = s"GraftSink[$p]"
    }
  }
}

/** Pruned+filtered v1 relation over a managed table. `buildScan` plans
  * `table.read.select(pruned).filter(pushed)` and hands back its internal
  * row RDD — the delegate plan keeps its own parquet pushdown and
  * whole-stage codegen; unconvertible filters are simply left for Spark's
  * post-scan Filter (the v1 contract: pushdown is advisory).
  */
case class GraftRelation(spark: SparkSession, tablePath: String)
    extends BaseRelation with PrunedFilteredScan {
  override def sqlContext: SQLContext = spark.sqlContext
  override def schema: StructType =
    new ManagedTable(spark, tablePath).read.schema
  override def needConversion: Boolean = false

  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val base = new ManagedTable(spark, tablePath).read
    val filtered = filters.flatMap(toColumn)
      .foldLeft(base)((df, c) => df.filter(c))
    // an empty projection (count(*)) is a legal zero-column scan
    val projected = filtered.select(requiredColumns.toIndexedSeq.map(col): _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
