package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's custom expressions, so SQL
  * users get the same operators as DataFrame users:
  *
  *  - `vec_dot(a, b)` — strict-fold double dot product ([[DotProduct]])
  *  - `vec_cosine(a, b)` — cosine similarity on top of it
  *  - `rolling_hash(s)` — the polynomial fingerprint ([[RollingHash]])
  *
  * Two registration paths:
  *  1. [[GraftExtensions]] via `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (the SparkSessionExtensions route — survives into every session built
  *     with the config);
  *  2. [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def cosineExpr(args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    val (a, b) = (args(0), args(1))
    Divide(DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
  }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("vec_cosine",
      new ExpressionInfo(classOf[DotProduct].getName, "vec_cosine"),
      cosineExpr _),
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args(0))),
    ("vec_moments",
      new ExpressionInfo(classOf[VectorMomentsAgg].getName, "vec_moments"),
      (args: Seq[Expression]) => args match {
        case Seq(v, org.apache.spark.sql.catalyst.expressions.Literal(d: Int,
            org.apache.spark.sql.types.IntegerType)) => VectorMomentsAgg(v, d)
        case _ => throw new IllegalArgumentException(
          "vec_moments(vec, dim) needs a literal int dimension")
      }))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
