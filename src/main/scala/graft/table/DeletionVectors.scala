package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector bitmap codec: a sorted set of per-file row indexes
  * serialized as delta-encoded unsigned varints, base64'd for the TSV
  * sidecar (the role of Delta's RoaringBitmapArray in its DV files,
  * deletion-vector protocol; reference: deltalake.ipynb's DELETE demo
  * rewrites files — DVs are the merge-on-read upgrade of that path).
  *
  * Delta-encoding makes dense runs cheap (~1 byte/row for consecutive
  * indexes), so a 1 M-row all-deleted file costs ~1 MB encoded, and the
  * common sparse case costs a few bytes per deleted row.
  */
object DvCodec {
  /** `idxs` must be sorted ascending and distinct (non-negative). */
  def encode(idxs: Array[Long]): String = {
    val out = new java.io.ByteArrayOutputStream(idxs.length + 8)
    var prev = -1L
    var i = 0
    while (i < idxs.length) {
      var d = idxs(i) - prev // >= 1: strictly increasing input
      prev = idxs(i)
      while ((d & ~0x7fL) != 0) { out.write(((d & 0x7f) | 0x80).toInt); d >>>= 7 }
      out.write(d.toInt)
      i += 1
    }
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  def decode(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prev = -1L
    var i = 0
    while (i < bytes.length) {
      var d = 0L; var shift = 0
      var b = bytes(i); i += 1
      while ((b & 0x80) != 0) { d |= (b & 0x7fL) << shift; shift += 7; b = bytes(i); i += 1 }
      d |= (b & 0x7fL) << shift
      prev += d
      buf += prev
    }
    buf.toArray
  }

  /** Union of two sorted-distinct index arrays, sorted distinct. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x < y) { out(k) = x; i += 1 }
      else if (y < x) { out(k) = y; j += 1 }
      else { out(k) = x; i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}

/** `true` iff `(filePath, rowIndex)` is marked deleted in `dv` — the
  * merge-on-read filter applied to every scan of a DV-carrying table
  * (Delta's per-scan deletion-vector row filter). Keys of `dv` are
  * `new Path(p).toString`-normalized file paths, so both the
  * `fs.makeQualified` form the manifest stores and the `_metadata
  * .file_path` form the scan produces resolve to the same entry.
  *
  * Scale shape: the map rides in the serialized expression (part of the
  * per-stage task binary, torrent-broadcast once per executor), so the
  * probe is a zero-shuffle, zero-join filter inside whole-stage codegen.
  * Rows arrive grouped by file, so a one-entry memo makes the per-row
  * cost a single content-equality check plus a binary search.
  */
case class DvDeleted(left: Expression, right: Expression,
                     dv: Map[String, Array[Long]]) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dv_deleted"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dv_deleted needs (string, bigint), got ${left.dataType}, ${right.dataType}")
    }

  // single-reference memo: written atomically, so a racing reader of a
  // shared deserialized instance sees a consistent (key, bitmap) pair or
  // misses — never a torn pair
  @transient private var memo: (UTF8String, Array[Long]) = _

  def deleted(file: UTF8String, idx: Long): Boolean = {
    val m = memo
    val arr =
      if (m != null && m._1.equals(file)) m._2
      else {
        // normalize the incoming path the same way the map keys were
        // (Path collapses file:/// vs file:/ and trailing-slash variants)
        val a = dv.getOrElse(new Path(file.toString).toString, null)
        memo = (file.clone(), a)
        a
      }
    arr != null && java.util.Arrays.binarySearch(arr, idx) >= 0
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    deleted(l.asInstanceOf[UTF8String], r.asInstanceOf[Long])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input)
    if (l == null || r == null) false
    else deleted(l.asInstanceOf[UTF8String], r.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvDeleted", this, classOf[DvDeleted].getName)
    val l = left.genCode(ctx); val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.value} = !${l.isNull} && !${r.isNull} &&
          $ref.deleted(${l.value}, ${r.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DvDeleted {
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def apply(file: Column, idx: Column, dv: Map[String, Array[Long]]): Column =
    column(DvDeleted(expression(file), expression(idx), dv))
}
