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
  *     commit log beside it — any Filter, non-trivial projection (e.g.
  *     column-mapping aliasing), or multi-root (time travel) scan bails;
  *   - the table must carry NO live deletion vectors: the raw scan being
  *     replaced is DV-unaware, so a log-derived (DV-adjusted) COUNT would
  *     silently change its answer (`minMaxFast` has the same gate
  *     internally; the count gate lives here);
  *   - `COUNT` only over non-null literals (`COUNT(*)`/`COUNT(1)`), no
  *     DISTINCT, no FILTER clause — served by `countFast`;
  *   - `MIN`/`MAX` only on a plain column whose `minMaxFast` proves
  *     exactness (non-string kind, every live file stats-covered) and
  *     whose bound strings parse losslessly into the scan's Catalyst
  *     type.
  *
  * Cost discipline: the rule runs inside the fixed-point operator batch,
  * so everything it does before bailing must be cheap. Aggregate SHAPES
  * are checked first (pure pattern match, no I/O); the `._log` root probe
  * and the per-(root, version) metadata answers are memoized process-wide
  * (version-keyed — an external commit naturally invalidates), so a
  * query's repeated optimizer iterations and repeated queries over one
  * hot table pay the metadata fold once, not per iteration.
  *
  * Registered by [[GraftSparkSessionExtension]]; sessions built without
  * extensions can install it at runtime via
  * `spark.experimental.extraOptimizations`.
  */
class MetadataOnlyAggregates(spark: SparkSession) extends Rule[LogicalPlan] {
  import MetadataOnlyAggregates._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    MetadataOnlyAggregates.maybeTrim()
    plan.transformDown {
      case agg: Aggregate
          if agg.groupingExpressions.isEmpty && shapesRewritable(agg) =>
        graftScanRoot(agg.child).flatMap(rewrite(agg, _)).getOrElse(agg)
    }
  }

  /** Cheap pre-gate: every output aggregate has a rewritable SHAPE
    * (COUNT of non-null literals / MIN / MAX of a plain column, no
    * distinct/filter). Pure pattern matching — runs before any
    * filesystem or metadata work so unsupported queries (AVG, SUM,
    * COUNT(col), …) cost nothing per optimizer iteration.
    */
  private def shapesRewritable(agg: Aggregate): Boolean =
    agg.aggregateExpressions.forall { ne =>
      val e = ne match { case Alias(child, _) => child; case other => other }
      e match {
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case c: Count => c.children.forall(a =>
              a.foldable && a.eval(InternalRow.empty) != null)
            case Min(_: AttributeReference) => true
            case Max(_: AttributeReference) => true
            case _ => false
          }
        case _ => false
      }
    }

  /** The graft table root under `p`, when `p` is a bare (attribute-only
    * projected) single-root file scan with a `v*.json`-bearing `._log`
    * sibling — the managed-table marker. The probe result is memoized
    * per root: whether a dir is graft-managed is stable for a session's
    * practical lifetime, and correctness never depends on it (a stale
    * negative only means the OPTIMIZATION is skipped).
    */
  private def graftScanRoot(p: LogicalPlan): Option[String] = p match {
    case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      graftScanRoot(ch)
    case SubqueryAlias(_, ch) => graftScanRoot(ch)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation if h.location.rootPaths.length == 1 =>
        val root = h.location.rootPaths.head.toString
        val isGraft = rootProbe.getOrElseUpdate(root, Try {
          val log = new Path(root + "._log")
          val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.exists(log) && fs.listStatus(log).exists { st =>
            val n = st.getPath.getName
            n.startsWith("v") && n.endsWith(".json")
          }
        }.getOrElse(false))
        if (isGraft) Some(root) else None
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, root: String): Option[LogicalPlan] = {
    val t = new ManagedTable(spark, root)
    val v = Try(t.version).getOrElse(return None)
    // DV gate (see scaladoc): a raw scan serves deleted rows; metadata
    // answers don't. Version-keyed memo — the probe itself reads one
    // small snapshot file, but not zero, so cache it with the answers.
    if (answerCache.getOrElseUpdate((root, v, "#dv"),
        Try(t.hasDeletionVectors).toOption.filter(_ == false)).isEmpty)
      return None

    def cnt: Option[Any] = answerCache.getOrElseUpdate((root, v, "#count"),
      Try(t.countFast()).toOption)
    def mm(c: String): Option[(String, String)] =
      answerCache.getOrElseUpdate((root, v, c),
        Try(t.minMaxFast(c)).toOption.flatten)
        .asInstanceOf[Option[(String, String)]]

    def evalOne(e: Expression): Option[Any] = e match {
      case ae: AggregateExpression =>
        ae.aggregateFunction match {
          case _: Count => cnt
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

object MetadataOnlyAggregates {
  /** root → is-graft-managed; process-wide, unbounded growth capped by
    * clear-at-1024 (a session touches a bounded set of table roots).
    */
  private val rootProbe =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** (root, version, column|"#count"|"#dv") → memoized metadata answer.
    * Version in the key makes external commits self-invalidating; the
    * periodic clear bounds residency (stale versions never hit again).
    */
  private val answerCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, String), Option[Any]]

  private[sql] def maybeTrim(): Unit = {
    if (rootProbe.size > 1024) rootProbe.clear()
    if (answerCache.size > 4096) answerCache.clear()
  }
}
