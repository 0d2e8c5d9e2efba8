package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** N-dimensional Hilbert curve index (Skilling's transform — John
  * Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004;
  * public algorithm). The Hilbert curve visits every cell of the
  * `2^bits × … × 2^bits` grid such that CONSECUTIVE indices are always
  * grid neighbors (one coordinate changes by exactly 1) — unlike the
  * Morton/Z curve, which takes long diagonal jumps at power-of-two
  * boundaries. For multi-dimensional data clustering that means a
  * contiguous index range maps to a tighter spatial blob, so per-file
  * min/max stats span narrower value ranges and range scans prune more
  * files (Databricks' liquid clustering moved from Z-order to Hilbert for
  * exactly this property).
  */
object Hilbert {

  /** Coords (each in `[0, 2^bits)`) → Hilbert index in `[0, 2^(n·bits))`.
    * Mutates `x` in place (callers pass a scratch copy).
    */
  def index(x: Array[Long], bits: Int): Long = {
    val n = x.length
    // Skilling inverse-undo: strip the excess-work transform MSB→LSB
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → scalar: bit plane j holds one bit per axis, axis 0 most
    // significant within the plane
    var out = 0L
    var j = 0
    while (j < bits) {
      var k = 0
      while (k < n) {
        out |= ((x(k) >> j) & 1L) << (j * n + (n - 1 - k))
        k += 1
      }
      j += 1
    }
    out
  }

  /** ArrayData adapter for [[HilbertIndex]]'s eval/codegen paths. */
  def indexOf(a: ArrayData, bits: Int): Long = {
    val n = a.numElements()
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = a.getLong(i); i += 1 }
    index(x, bits)
  }
}

/** Catalyst expression: `array<long>` of per-column grid coordinates →
  * BIGINT Hilbert index. Codegen'd (a static call — the loop cost is a
  * few dozen XORs), so the clustering rewrite stays inside whole-stage
  * codegen like [[DotProduct]].
  */
case class HilbertIndex(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if bits >= 1 && bits <= 62 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"HilbertIndex needs array<bigint> and 1 <= bits <= 62, got $t / $bits")
    }

  override def nullSafeEval(v: Any): Any =
    Hilbert.indexOf(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Hilbert$$.MODULE$$.indexOf($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
