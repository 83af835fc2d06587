package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns, with whole-stage
  * codegen.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback: every element evaluation goes through the
  * interpreted expression tree with per-element lambda-variable
  * binding — ~10-30× slower than a fused loop, and it breaks the
  * surrounding codegen stage. This expression is the (b)-tier answer
  * from the build plan: a scalar Catalyst `Expression` with `doGenCode`,
  * keeping kNN / near-dup scoring inside one codegen stage.
  *
  * Summation is a sequential left-to-right fold from 0.0 — bit-identical
  * to `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`
  * and to DuckDB's `list_reduce(list_prepend(0.0, …))`, so DuckDB-oracle
  * parity is preserved exactly.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ArrayDot = copy(left = l, right = r)
}

object VectorOps {

  /** `array_dot(a, b)` — codegen'd Σ aᵢ·bᵢ over array<double>. */
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm via self-dot (same fold order as the HOF formulation). */
  def l2Norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(arrayDot(a, a))
}
