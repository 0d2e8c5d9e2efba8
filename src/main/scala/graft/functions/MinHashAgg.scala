package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass MinHash signature as a [[TypedImperativeAggregate]]: the
  * buffer is one `Array[Long]` of running minima per hash function, updated
  * in place per shingle hash — the SURVEY.md §7.5 "attractive custom
  * aggregate" realized.
  *
  * Versus the explode + N-MIN-columns plan ([[graft.ops.Dedup
  * .minhashSignatures]]): same values (identical universal-hash family),
  * but one aggregate expression instead of N, a compact primitive buffer,
  * and partial-merge = element-wise min — useful when N is large enough
  * that an N-column row gets unwieldy. Kept alongside the columnar plan;
  * equality is asserted in the spec.
  *
  * Input: the shingle hash reduced mod p (2^31−1); params (a_i, b_i) are
  * seeded identically to Dedup.hashParams.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = 2147483647L
  @transient private lazy val params: Array[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Array.fill(numHashes)((1L + r.nextLong(P - 1), r.nextLong(P)))
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] % P
      var i = 0
      while (i < numHashes) {
        val x = (params(i)._1 * h + params(i)._2) % P
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Column form: aggregate a column of shingle hashes (mod p) into the
    * MinHash signature.
    */
  def minhash_agg(hashes: Column, numHashes: Int, seed: Long = 42L): Column =
    column(MinHashAgg(expression(hashes), numHashes, seed).toAggregateExpression())
}
