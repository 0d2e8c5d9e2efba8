package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Strict left-to-right dot product of two numeric arrays in DOUBLE
  * precision, as a native Catalyst expression with whole-stage codegen.
  *
  * Why custom (SURVEY.md §7.5 preference order b): the composable form
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a higher-order function —
  * CodegenFallback, interpreted per row, and it allocates an intermediate
  * array per evaluation. On pairwise similarity (O(n²) evaluations) that
  * interpretation dominated the benchmark. This expression generates a
  * tight fused loop, no allocation, and keeps the surrounding operators
  * inside one WholeStageCodegen span.
  *
  * Numeric contract: identical fold order and widening as the composable
  * form and as DuckDB's `list_dot_product(CAST(a AS DOUBLE[]), ...)` —
  * bit-identical results (the DuckDB-oracle queries rely on this).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def accessor(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _)  => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(s"DotProduct needs array<float|double>, got $t")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"DotProduct needs two array<float|double> args, got ${left.dataType}, ${right.dataType}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched dimensions must ERROR, not silently truncate: a corrupt
    // 32-dim row among 64-dim embeddings would otherwise mis-rank kNN /
    // semDedup with a plausible-looking score (the DuckDB twin,
    // list_dot_product, rejects mismatches the same way)
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: mismatched vector lengths ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    val leftFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rightFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ga = accessor(left); val gb = accessor(right)
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: mismatched vector lengths " + $a.numElements() +
         |      " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$ga($i)) * ((double) $b.$gb($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the vector expressions. */
object Vec {
  import org.apache.spark.sql.functions.{sqrt => fsqrt}
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))

  def norm(a: Column): Column = fsqrt(dot(a, a))
}
