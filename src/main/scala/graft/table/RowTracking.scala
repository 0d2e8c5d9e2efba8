package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-tracking constants (Delta's row-tracking table feature): every row
  * of an enabled table carries a STABLE unique id, surfaced as the
  * [[RowTracking.col]] column by `ManagedTable.readWithRowIds`.
  *
  * Two physical forms, Delta's same split:
  *  - FRESH files (appends): the id is `baseRowId(file) + row_index`,
  *    computed at scan time from the per-file base recorded in the
  *    `_rowids.txt` log sidecar — nothing is written into the data file;
  *  - MATERIALIZED files (maintenance rewrites): the id rides as a real
  *    parquet column, written by OPTIMIZE / CLUSTER / PURGE when they
  *    rewrite files, because a rewrite re-positions rows and the
  *    base+index form can no longer represent them.
  *
  * Merge-on-read DML (deletion vectors) never moves a surviving row, so
  * ids are stable through DELETE/UPDATE/MERGE by construction; OPTIMIZE
  * and friends preserve them by materializing; copy-on-write rewrites
  * (OVERWRITE, the legacy whole-table DML, schema rewrites) reset ids —
  * they replace the rows themselves.
  */
object RowTracking {
  /** Reserved physical/logical column name. Never appears in a normal
    * `read` (scans drop it); excluded from data-skipping stats so it can
    * not displace a user column from the stats window.
    */
  val col = "_graft_row_id"

  /** Sentinel stats kind recorded for a file whose footer carries the
    * materialized column — how `commit` recognizes a maintenance
    * rewrite's output without a second footer read.
    */
  val statsKind = "R"
}

/** `baseRowId` of the file a row came from — probes a broadcast-riding
  * (path → base) map exactly like [[DvDeleted]] probes its bitmap map:
  * zero-shuffle, zero-join, whole-stage-codegen friendly, one-entry memo
  * because rows arrive grouped by file. Missing file ⇒ runtime error (the
  * caller only scans files it has bases for).
  */
case class FileBaseRowId(child: Expression, bases: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "file_base_row_id"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"file_base_row_id needs a string file path, got $t")
    }

  @transient private var memo: (UTF8String, Long) = _

  def base(file: UTF8String): Long = {
    val m = memo
    if (m != null && m._1.equals(file)) m._2
    else {
      val b = bases.getOrElse(new Path(file.toString).toString,
        throw new IllegalStateException(
          s"no row-id base recorded for scanned file $file"))
      memo = (file.clone(), b)
      b
    }
  }

  override def nullSafeEval(input: Any): Any =
    base(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fileBase", this, classOf[FileBaseRowId].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = $ref.base(${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FileBaseRowId {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def apply(file: Column, bases: Map[String, Long]): Column =
    column(FileBaseRowId(expression(file), bases))
}
