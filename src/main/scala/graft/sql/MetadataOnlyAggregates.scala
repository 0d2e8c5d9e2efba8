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
  *   - the live dir must hold EXACTLY the version's logged files
  *     ([[ManagedTable.dirMatchesLog]], one listing PER REWRITE — never
  *     memoized): an out-of-band file in the dir changes the raw scan's
  *     answer without moving the version or the manifest signature, so
  *     a memoized gate (or ungated cached answers) would keep serving a
  *     log-derived COUNT while the scan it replaced diverged;
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
      case agg: Aggregate
          if agg.groupingExpressions.nonEmpty && groupedShapesRewritable(agg) =>
        graftScanRoot(agg.child).flatMap(rewriteGrouped(agg, _)).getOrElse(agg)
    }
  }

  /** Cheap pre-gate for the GROUPED form (Spark's own
    * OptimizeMetadataOnlyQuery shape): every grouping expression is a
    * plain column and every output is either a grouping column or a
    * COUNT of non-null literals — `SELECT DISTINCT part_col` and
    * `COUNT(*) GROUP BY part_col` both match. Pure pattern matching.
    */
  private def groupedShapesRewritable(agg: Aggregate): Boolean =
    agg.groupingExpressions.forall(_.isInstanceOf[AttributeReference]) &&
      agg.aggregateExpressions.forall { ne =>
        val e = ne match { case Alias(child, _) => child; case other => other }
        e match {
          case a: AttributeReference =>
            agg.groupingExpressions.exists {
              case g: AttributeReference => g.exprId == a.exprId
              case _ => false
            }
          case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case c: Count => c.children.forall(a =>
                a.foldable && a.eval(InternalRow.empty) != null)
              case _ => false
            }
          case _ => false
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
            // COUNT(*) / COUNT(1) (all non-null literals) or COUNT(col)
            // (exactly ONE attribute — answered from the null-count
            // fold). Multi-argument COUNT(a, b) counts rows where EVERY
            // argument is non-null; no metadata fold answers that, so it
            // must NOT pass this gate (evalOne's `_: Count` arm would
            // silently serve the total row count)
            case c: Count =>
              c.children.forall(a =>
                a.foldable && a.eval(InternalRow.empty) != null) ||
                (c.children.length == 1 &&
                  c.children.head.isInstanceOf[AttributeReference])
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
        // cache only SUCCESSFUL probes: a transient FS fault must not
        // disable the rewrite for this root for the process lifetime
        val isGraft = rootProbe.get(root).getOrElse(Try {
          val log = new Path(root + "._log")
          val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.exists(log) && fs.listStatus(log).exists { st =>
            val n = st.getPath.getName
            n.startsWith("v") && n.endsWith(".json")
          }
        } match {
          case scala.util.Success(b) => rootProbe.put(root, b); b
          case scala.util.Failure(_) => false
        })
        if (isGraft) Some(root) else None
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, root: String): Option[LogicalPlan] = {
    val t = new ManagedTable(spark, root)
    val v = Try(t.version).getOrElse(return None)
    // answers are memoized under (root, version, MANIFEST SIGNATURE):
    // the version number alone restarts after a drop-and-recreate at the
    // same path, so the signature of v's manifest file distinguishes
    // incarnations — a rebuilt table can never serve the dead one's
    // cached count. One small getFileStatus per rewrite.
    val key = incarnationKey(t, root).getOrElse(return None)
    // DV gate (see scaladoc): a raw scan serves deleted rows; metadata
    // answers don't. Memoized like the answers — the probe itself reads
    // one small snapshot file, but not zero.
    if (!dvFreeCache.getOrElseUpdate(key,
        Try(t.hasDeletionVectors).toOption.contains(false)))
      return None
    // dir↔log gate: the rewrite replaces a RAW dir scan with log-derived
    // answers, so it must first prove the dir holds exactly the version's
    // logged files — an out-of-band parquet file (a state the manifest-
    // is-truth trust model tolerates until a trust boundary) moves
    // neither the version nor the manifest signature, so this probe is
    // deliberately NOT memoized under the incarnation key: a stray that
    // lands after one rewrite must decline the next, cached answers
    // included (the answer memos below stay keyed by incarnation — they
    // are log-derived and exact WHENEVER this gate passes). Cost: one
    // O(live) listing per rewritten query — the same order of work the
    // replaced scan's own file index pays — and zero for every query the
    // shape/root gates already bailed on.
    if (!Try(t.dirMatchesLog).toOption.contains(true))
      return None

    def cnt: Option[Any] = countCache.getOrElseUpdate(key,
      Try(t.countFast()).toOption)
    def mm(c: String): Option[(String, String)] =
      mmCache.getOrElseUpdate((key, c),
        Try(t.minMaxFast(c)).toOption.flatten)
    def nnc(c: String): Option[Any] =
      nncCache.getOrElseUpdate((key, c),
        Try(t.nonNullCountFast(c)).toOption.flatten)

    def evalOne(e: Expression): Option[Any] = e match {
      case ae: AggregateExpression =>
        ae.aggregateFunction match {
          // COUNT(col): non-null count from the null-count stats fold
          // (exact only when every live file covers the column — the
          // fold suppresses the answer otherwise and we fall through);
          // a PARTITION column has no file stats but every row holds its
          // partition's value, so Σ partition row counts answers it (the
          // rollup already bails on Hive null-marker partitions)
          case Count(Seq(a: AttributeReference)) =>
            nnc(a.name).orElse(
              partitionRollup(key, t).flatMap { case (pcols, parts) =>
                if (pcols.exists(_.equalsIgnoreCase(a.name)))
                  Some(parts.map(_._2).sum)
                else None
              })
          // belt-and-braces mirror of the shape gate: the total row count
          // only answers COUNT over non-null literals
          case c: Count if c.children.forall(a =>
              a.foldable && a.eval(InternalRow.empty) != null) => cnt
          // a PARTITION column's extremes come from the partition values
          // themselves (works where stats bail, e.g. string kinds —
          // every row in a partition holds exactly that value, zero-row
          // partitions dropped); data columns keep the stats fold
          case Min(a: AttributeReference) =>
            mm(a.name).flatMap { case (mn, _) => parseBound(mn, a.dataType) }
              .orElse(partitionExtreme(key, t, a, isMin = true))
          case Max(a: AttributeReference) =>
            mm(a.name).flatMap { case (_, mx) => parseBound(mx, a.dataType) }
              .orElse(partitionExtreme(key, t, a, isMin = false))
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

  /** The GROUPED rewrite — Spark's `OptimizeMetadataOnlyQuery` analogue
    * over the graft log: when every grouping column is a partition
    * column, `SELECT DISTINCT part_cols` / `COUNT(*) … GROUP BY
    * part_cols` answer from the SHOW-PARTITIONS fold (manifest +
    * sidecar, zero data files). Exactness gates on top of the global
    * form's (DV-free, dir==log): every grouping attr resolves to a
    * logged partition column, every partition value parses losslessly
    * into the scan's inferred type, and zero-row partitions (a dir
    * whose files hold no rows) are dropped — a raw scan never surfaces
    * their values.
    */
  private def rewriteGrouped(agg: Aggregate, root: String): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference => a }
    if (groupAttrs.size != agg.groupingExpressions.size) return None
    val t = new ManagedTable(spark, root)
    val key = incarnationKey(t, root).getOrElse(return None)
    if (!dvFreeCache.getOrElseUpdate(key,
        Try(t.hasDeletionVectors).toOption.contains(false)))
      return None
    if (!Try(t.dirMatchesLog).toOption.contains(true)) return None
    val (pcols, parts) = partitionRollup(key, t).getOrElse(return None)
    val idxOf = groupAttrs.map(a =>
      pcols.indexWhere(_.equalsIgnoreCase(a.name)))
    if (idxOf.exists(_ < 0)) return None
    // roll the per-partition counts up to the REQUESTED grouping subset
    val grouped: Map[Seq[String], Long] = parts
      .groupBy { case (values, _) => idxOf.map(values) }
      .map { case (k2, vs) => k2 -> vs.map(_._2).sum }
    val attrValue: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Int] =
      groupAttrs.map(_.exprId).zip(idxOf.indices).toMap
    val outRows = grouped.toSeq.map { case (values, cnt) =>
      val parsed = groupAttrs.indices.map { gi =>
        parsePartitionValue(values(gi), groupAttrs(gi).dataType)
          .getOrElse(return None)
      }
      val cells = agg.aggregateExpressions.map { ne =>
        val e = ne match { case Alias(child, _) => child; case other => other }
        e match {
          case a: AttributeReference =>
            attrValue.get(a.exprId).map(parsed).getOrElse(return None)
          case ae: AggregateExpression => ae.aggregateFunction match {
            case _: Count => cnt
            case _ => return None
          }
          case _ => return None
        }
      }
      InternalRow.fromSeq(cells)
    }
    Some(LocalRelation(agg.output, outRows))
  }

  /** (root, version, manifest signature) — the shared memo key. */
  private def incarnationKey(t: ManagedTable, root: String): Option[TableKey] =
    Try {
      val v = t.version
      val m = new Path(root + "._log", f"v$v%05d.json")
      val st = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(m)
      (root, v, st.getLen, st.getModificationTime)
    }.toOption

  /** Per-partition (values, physical row count) with zero-row partitions
    * dropped, memoized per incarnation (the fold is manifest+sidecar
    * work, no data files). None for unpartitioned tables, any partition
    * carrying Hive's null marker, or a failed fold.
    */
  private def partitionRollup(key: TableKey, t: ManagedTable)
      : Option[(Seq[String], Seq[(Seq[String], Long)])] =
    partCache.getOrElseUpdate(key, Try {
      val pdf = t.partitions()
      val names = pdf.schema.fieldNames.toSeq.dropRight(3)
      val rows = pdf.collect().toSeq.map { r =>
        (names.indices.map(r.getString), r.getAs[Long]("row_count"))
      }.filter(_._2 > 0L)
      if (rows.exists(_._1.exists(_ == "__HIVE_DEFAULT_PARTITION__")))
        throw new IllegalStateException("null partition value")
      (names, rows)
    }.toOption)

  /** A partition-dir value string as the Catalyst-internal value of the
    * scan's inferred type for that column.
    */
  private def parsePartitionValue(s: String, dt: DataType): Option[Any] =
    dt match {
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case _ => parseBound(s, dt)
    }

  /** MIN/MAX of a PARTITION column from the partition values (every row
    * in a partition holds exactly its value; zero-row partitions are
    * already dropped by [[partitionRollup]]); None when `a` is not a
    * partition column, the table is empty, or a value fails to parse.
    */
  private def partitionExtreme(key: TableKey, t: ManagedTable,
      a: AttributeReference, isMin: Boolean): Option[Any] = {
    val (pcols, parts) = partitionRollup(key, t).getOrElse(return None)
    val i = pcols.indexWhere(_.equalsIgnoreCase(a.name))
    if (i < 0 || parts.isEmpty) return None
    val vals = parts.map(p =>
      parsePartitionValue(p._1(i), a.dataType).getOrElse(return None))
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(a.dataType).asInstanceOf[Ordering[Any]]
    Some(if (isMin) vals.min(ord) else vals.max(ord))
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
  /** Incarnation key: (root, version, manifest len, manifest mtime) —
    * external commits move the version, drop-and-recreate moves the
    * signature, so stale hits are structurally impossible.
    */
  private type TableKey = (String, Long, Long, Long)

  /** root → is-graft-managed; process-wide (successful probes only —
    * errors are never cached), growth capped by clear-at-1024.
    */
  private val rootProbe =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Typed memo per answer kind (separate maps, no sentinel keys that a
    * real column name could collide with). Stale versions never hit
    * again; the periodic clear bounds residency.
    */
  private val dvFreeCache =
    scala.collection.concurrent.TrieMap.empty[TableKey, Boolean]
  private val countCache =
    scala.collection.concurrent.TrieMap.empty[TableKey, Option[Any]]
  private val mmCache =
    scala.collection.concurrent.TrieMap.empty[(TableKey, String), Option[(String, String)]]
  private val nncCache =
    scala.collection.concurrent.TrieMap.empty[(TableKey, String), Option[Long]]
  private val partCache =
    scala.collection.concurrent.TrieMap.empty[TableKey,
      Option[(Seq[String], Seq[(Seq[String], Long)])]]

  private[sql] def maybeTrim(): Unit = {
    if (rootProbe.size > 1024) rootProbe.clear()
    if (dvFreeCache.size > 4096) dvFreeCache.clear()
    if (countCache.size > 4096) countCache.clear()
    if (mmCache.size > 4096) mmCache.clear()
    if (nncCache.size > 4096) nncCache.clear()
    if (partCache.size > 4096) partCache.clear()
  }
}
