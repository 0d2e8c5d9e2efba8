package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Parser injection for the graft SQL command surface — the same
  * architecture Delta uses for `MERGE INTO` / `DESCRIBE HISTORY` /
  * `OPTIMIZE` / `VACUUM` (an ANTLR delegate-wrapping `ParserInterface`
  * registered through `SparkSessionExtensions.injectParser`): graft
  * statements parse to [[GraftSqlCommands]] plans, everything else goes to
  * the delegate Spark parser verbatim. The resulting plans are plain
  * `LeafRunnableCommand`s, so Catalyst's built-in command execution path
  * runs them eagerly — no custom `SparkStrategy` needed.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlCommands.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Session extension installing [[GraftSqlParser]]. Register at session
  * build time, either way Spark supports:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftSparkSessionExtension)          // in code
  *   .config("spark.sql.extensions",
  *           "graft.sql.GraftSparkSessionExtension")          // or by conf
  * }}}
  *
  * after which `spark.sql("DESCRIBE HISTORY graft.`/path`")` etc. work
  * directly. For a session built WITHOUT extensions, [[GraftSql.sql]] is
  * the equivalent front door.
  */
class GraftSparkSessionExtension extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectParser((_, delegate) => new GraftSqlParser(delegate))
    GraftTableFunctions.all.foreach(extensions.injectTableFunction)
    // Delta's OptimizeMetadataOnlyDeltaQuery analogue: COUNT/MIN/MAX over
    // a managed scan answered from the commit log when provably exact
    extensions.injectOptimizerRule(s => new MetadataOnlyAggregates(s))
  }
}

/** Front door for sessions built without the parser extension (e.g. a
  * shared session owned by a host application): graft statements execute
  * eagerly — matching `spark.sql`'s command semantics — and return their
  * result as a DataFrame; anything else is handed to `spark.sql`.
  */
object GraftSql {
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    GraftSqlCommands.parse(sqlText) match {
      case Some(cmd) =>
        val rows = cmd.run(spark)
        val schema = StructType(cmd.output.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
      case None => spark.sql(sqlText)
    }
}
