package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass vector first+second moments as a [[TypedImperativeAggregate]]:
  * per input vector x (array<float|double> of length `dim`) the buffer
  * accumulates n, Σx (length d) and the upper triangle of Σxxᵀ (length
  * d(d+1)/2, row-major: (i,j) with j ≥ i at offset i·d − i(i−1)/2 + (j−i)).
  *
  * This is the covariance/PCA building block that scales: one pass over the
  * store, partial buffers of O(d²) doubles per task, merge = element-wise
  * add — the data never shuffles, only the ~17 KB buffers (d=64). The
  * explode-based alternative materializes n·d²/2 rows; at a 100 TB embedding
  * store that is the difference between a metadata-sized aggregation and a
  * petabyte shuffle.
  *
  * Numeric contract: plain double accumulation in array order; partial-merge
  * order follows Spark's task completion, so results are deterministic only
  * up to double-addition reassociation (~1e-12 relative). The bit-exact
  * oracle twin (q107) uses the DECIMAL-contract explode plan instead;
  * equality within tolerance is asserted in EmbeddingsSpec.
  *
  * Rows whose array is null or not exactly `dim` long are skipped (counted
  * by neither n nor the sums) — a poisoned row must not kill a corpus-wide
  * statistics job.
  */
case class VectorMomentsAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val triLen = dim * (dim + 1) / 2
  // buffer layout: [0]=n, [1..dim]=s, [1+dim ..]=upper-tri ss
  private val bufLen = 1 + dim + triLen

  @transient private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("ss", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"VectorMomentsAgg needs array<float|double>, got $t")
    }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (a.numElements() == dim) {
        val x = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          x(i) = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
          buf(1 + i) += x(i)
          i += 1
        }
        buf(0) += 1.0
        var k = 1 + dim
        i = 0
        while (i < dim) {
          var j = i
          while (j < dim) {
            buf(k) += x(i) * x(j)
            k += 1; j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericInternalRow(Array[Any](
      buf(0).toLong,
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + dim)),
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1 + dim, bufLen))))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * bufLen)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorMomentsAgg {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Column form: one struct(n, s, ss) row for a vector column. */
  def vector_moments(vec: Column, dim: Int): Column =
    column(VectorMomentsAgg(expression(vec), dim).toAggregateExpression())
}
