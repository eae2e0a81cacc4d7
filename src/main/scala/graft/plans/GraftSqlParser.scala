package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension: `spark.sql("pattern: …")` compiles the engine's CEP
  * plan dialect (the same text the control plane and `env.plan` accept),
  * so ONE textual surface reaches all three entry points. Everything
  * else delegates to Spark's parser untouched.
  *
  * Registered via `SparkSessionExtensions.injectParser`
  * ([[GraftExtensions]]); batch pattern text lands on the
  * MATCH_RECOGNIZE custom operator through [[graft.control.PlanCompiler]].
  */
class GraftSqlParser(delegate: ParserInterface, session: SparkSession)
    extends ParserInterface {

  private def isPattern(t: String): Boolean =
    t.trim.toLowerCase.startsWith("pattern:")

  override def parsePlan(sqlText: String): LogicalPlan =
    if (isPattern(sqlText))
      // compile against the OWNING session, not SparkSession.active —
      // with multiple sessions the thread-local active one may be a
      // different tenant whose same-named views would silently win
      graft.control.PlanCompiler.compile(session, sqlText)
        .queryExecution.logical
    else delegate.parsePlan(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    if (isPattern(sqlText)) parsePlan(sqlText)
    else delegate.parseQuery(sqlText)

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
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
