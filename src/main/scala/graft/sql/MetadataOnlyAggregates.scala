package graft.sql

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.table.ManagedTable

/** Metadata-only rewrite of global `COUNT(*)` / `MIN(col)` / `MAX(col)`
  * over a graft-managed parquet scan — Delta's
  * `OptimizeMetadataOnlyDeltaQuery`: when every aggregate in the query is
  * answerable exactly from the commit log's stats fold, the whole
  * aggregate collapses to a pre-computed single-row [[LocalRelation]] and
  * ZERO data files are opened. On a 100 TB table that turns a full-scan
  * count into a driver metadata lookup (`countFast`, itself a Spark-job
  * fold above the distributed-planning cutover — never O(table) I/O).
  *
  * Exactness gates, all conservative (any failure falls through to the
  * ordinary scan, which is always correct):
  *   - the child must be a BARE single-root parquet relation with a graft
  *     commit log beside it — any Filter (including the deletion-vector
  *     filter a DV-carrying read plans), non-trivial projection (e.g.
  *     column-mapping aliasing), or multi-root (time travel) scan bails;
  *   - `COUNT` only over non-null literals (`COUNT(*)`/`COUNT(1)`), no
  *     DISTINCT, no FILTER clause — served by `countFast` (DV-exact);
  *   - `MIN`/`MAX` only on a plain column whose `minMaxFast` proves
  *     exactness (non-string kind, every live file stats-covered, no
  *     outstanding DVs) and whose bound strings parse losslessly into the
  *     scan's Catalyst type.
  *
  * Registered by [[GraftSparkSessionExtension]]; sessions built without
  * extensions can install it at runtime via
  * `spark.experimental.extraOptimizations`.
  */
class MetadataOnlyAggregates(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      graftScanRoot(agg.child).flatMap(rewrite(agg, _)).getOrElse(agg)
  }

  /** The graft table root under `p`, when `p` is a bare (attribute-only
    * projected) single-root file scan with a `v*.json`-bearing `._log`
    * sibling — the managed-table marker.
    */
  private def graftScanRoot(p: LogicalPlan): Option[String] = p match {
    case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      graftScanRoot(ch)
    case SubqueryAlias(_, ch) => graftScanRoot(ch)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation if h.location.rootPaths.length == 1 =>
        val root = h.location.rootPaths.head
        val log = new Path(root.toString + "._log")
        Try {
          val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.exists(log) && fs.listStatus(log).exists { st =>
            val n = st.getPath.getName
            n.startsWith("v") && n.endsWith(".json")
          }
        }.toOption.filter(identity).map(_ => root.toString)
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, root: String): Option[LogicalPlan] = {
    val t = new ManagedTable(spark, root)
    lazy val cntOpt: Option[Long] = Try(t.countFast()).toOption
    val mmCache = scala.collection.mutable.Map.empty[String, Option[(String, String)]]
    def mm(c: String): Option[(String, String)] =
      mmCache.getOrElseUpdate(c, Try(t.minMaxFast(c)).toOption.flatten)

    def evalOne(e: Expression): Option[Any] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count if c.children.forall(a =>
              a.foldable && a.eval(InternalRow.empty) != null) =>
            cntOpt
          case Min(a: AttributeReference) =>
            mm(a.name).flatMap { case (mn, _) => parseBound(mn, a.dataType) }
          case Max(a: AttributeReference) =>
            mm(a.name).flatMap { case (_, mx) => parseBound(mx, a.dataType) }
          case _ => None
        }
      case _ => None
    }

    val vals = agg.aggregateExpressions.map {
      case Alias(child, _) => evalOne(child)
      case other => evalOne(other)
    }
    if (vals.exists(_.isEmpty)) None
    else Some(LocalRelation(agg.output,
      Seq(InternalRow.fromSeq(vals.map(_.get)))))
  }

  /** A `columnStats` bound string as the Catalyst-internal value of `dt`,
    * None when the conversion is not provably lossless. Formats follow
    * `formatColumnStats`: numeric kinds are plain decimal strings, dates
    * ISO local dates, timestamps ISO instants (TZ) / local date-times
    * (NTZ).
    */
  private def parseBound(s: String, dt: DataType): Option[Any] = Try {
    dt match {
      case LongType => new java.math.BigDecimal(s).longValueExact()
      case IntegerType => new java.math.BigDecimal(s).intValueExact()
      case ShortType => new java.math.BigDecimal(s).shortValueExact()
      case ByteType => new java.math.BigDecimal(s).byteValueExact()
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case d: DecimalType =>
        val v = Decimal(BigDecimal(s))
        if (v.changePrecision(d.precision, d.scale)) v
        else throw new ArithmeticException(s"$s exceeds $d")
      case DateType =>
        java.time.LocalDate.parse(s).toEpochDay.toInt
      case TimestampType =>
        val i = java.time.Instant.parse(s)
        Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
          i.getNano / 1000L)
      case TimestampNTZType =>
        val ldt = java.time.LocalDateTime.parse(s)
        val i = ldt.toInstant(java.time.ZoneOffset.UTC)
        Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
          i.getNano / 1000L)
      case _ => throw new IllegalArgumentException(s"unsupported $dt")
    }
  }.toOption
}
