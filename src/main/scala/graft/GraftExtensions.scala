package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{JavaStringHash, WordGramHashes}

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
    e.injectFunction(GraftFunctions.wordGramHashesDescriptor)
  }
}

object GraftFunctions {

  private[graft] val javaStringHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("java_string_hash"),
    new ExpressionInfo(classOf[JavaStringHash].getName, "java_string_hash"),
    (children: Seq[Expression]) => JavaStringHash(children.head))

  private[graft] val wordGramHashesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_gram_hashes"),
    new ExpressionInfo(classOf[WordGramHashes].getName, "word_gram_hashes"),
    (children: Seq[Expression]) =>
      WordGramHashes(children(0), children(1), children(2)))

  /** Register graft functions on a live session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "java_string_hash",
      exprs => JavaStringHash(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_gram_hashes",
      exprs => WordGramHashes(exprs(0), exprs(1), exprs(2)),
      "built-in")
  }
}
