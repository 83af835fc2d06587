package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.JavaStringHash

/** SQL-surface registration of graft's native expressions.
  *
  * Two paths:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.GraftExtensions`
  *     at session build time (spark-submit / cluster deployments)
  *   - [[GraftFunctions.register]] for an already-running session
  *     (notebooks, tests)
  *
  * After either, `SELECT java_string_hash(col)` works in plain SQL and
  * participates in whole-stage codegen like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.javaStringHashDescriptor)
  }
}

object GraftFunctions {

  private[graft] val javaStringHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("java_string_hash"),
    new ExpressionInfo(classOf[JavaStringHash].getName, "java_string_hash"),
    (children: Seq[Expression]) => JavaStringHash(children.head))

  /** Register graft functions on a live session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "java_string_hash",
      exprs => JavaStringHash(exprs.head),
      "built-in")
}
