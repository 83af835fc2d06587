package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `java.lang.String.hashCode` as a native Catalyst expression with full
  * codegen — the hash the reference's Kafka partitioner uses:
  * `abs(partitionKey.hashCode % numPartitions)`
  * (reference partitioner/FlinkCDCSimplePartitioner.scala:13).
  *
  * A custom `Expression` (not a UDF) so it stays inside whole-stage
  * codegen in the sink projection hot path.
  */
case class JavaStringHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "java_string_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(c: Expression): JavaStringHash =
    copy(child = c)
}

object JavaHash {

  /** `java_string_hash(col)` — signed 32-bit Java string hash. */
  def javaStringHash(c: Column): Column =
    ColumnBridge.column(JavaStringHash(ColumnBridge.expression(c)))

  /** Kafka partition assignment bit-identical to the reference:
    * `abs(key.hashCode % numPartitions)` with Java semantics — `%` keeps
    * the dividend's sign and `abs` applies after (reference
    * FlinkCDCSimplePartitioner.scala:9-16). Spark's `%` and `abs` on
    * integers match Java exactly.
    */
  def partitionFor(key: Column, numPartitions: Int): Column =
    org.apache.spark.sql.functions.abs(javaStringHash(key) % numPartitions)
}
