package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen expression — the
  * semi-join pre-filter for joins whose build side is too large to
  * broadcast as a hash table but whose *key sketch* still fits in a few
  * megabytes.
  *
  * The scale shape this enables: `fact JOIN dim` where both sides must
  * sort-merge (dim ≫ broadcast threshold). Without the probe, the full
  * fact table shuffles on the join key; with it, fact rows whose key
  * cannot be in dim are dropped at the scan, *before* the exchange —
  * the same row-level runtime filtering a warehouse pushes into scans,
  * made explicit and deterministic. False positives survive the probe
  * but are removed by the exact join that follows, so the query result
  * is bit-identical to the unfiltered join (the property the paired
  * oracle and ScaleOpsSpec both pin).
  *
  * The filter itself is built distributed (partial sketches merged via
  * `DataFrameStatFunctions.bloomFilter`'s treeAggregate) and shipped to
  * executors inside the serialized expression — for the default 1M-key /
  * 1% sizing that is ~1.2 MB, broadcast-sized regardless of fact-table
  * scale.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the sketch rides along as a referenced object in the generated
    // class — probes stay inside whole-stage codegen, zero boxing
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}

object BloomOps {

  /** `might_contain(key)` against a pre-built sketch. Nulls propagate
    * (null key ⇒ null ⇒ dropped by filter), matching inner-join
    * null-key semantics.
    */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), bloom))
}
