package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash band signatures: `minhash_bands(gram_hashes)` ⇒
  * `array<string>` of `numBands` banded signature strings
  * (`"mh-mh-mh-mh"`), where `mh_i = min over h of (h·(2i+1) +
  * (7919·i+1)) mod 4294967311` — the same universal-hash family and
  * band layout as the batch SQL form in `DedupQueries` (and its DuckDB
  * oracle), fused into one pass over the gram-hash array.
  *
  * The 100 TB significance is not the CPU fusion but the PLAN shape it
  * unlocks: the explode → groupBy(doc) → 16 partial-aggregated mins
  * pipeline needs a shuffle keyed on doc_id; computed per row, the
  * signature stage is scan→project with NO exchange at any scale —
  * the LSH bucket join becomes the dedup pipeline's only shuffle.
  */
case class MinHashBands(child: Expression, numHashes: Int, bandSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<long>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashBands.compute(v.asInstanceOf[ArrayData], numHashes, bandSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBands.compute($c, $numHashes, $bandSize);")

  override protected def withNewChildInternal(c: Expression): MinHashBands =
    copy(child = c)
}

object MinHashBands {

  /** Same coefficients as the batch SQL form (`DedupQueries.aCoef/bCoef/P`
    * and its oracle): keep the three definitions in sync.
    */
  private val P = 4294967311L

  def compute(hs: ArrayData, numHashes: Int, bandSize: Int): ArrayData = {
    val n = hs.numElements()
    // empty gram array ⇒ empty bands (defensive: the clamped shingler
    // always yields ≥ 1 gram, so this branch is unreachable when wired)
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val mins = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = 2L * i + 1
      val b = 7919L * i + 1
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (hs.getLong(j) * a + b) % P
        if (v < best) best = v
        j += 1
      }
      mins(i) = best
      i += 1
    }
    val numBands = numHashes / bandSize
    val out = new Array[AnyRef](numBands)
    val sb = new java.lang.StringBuilder(48)
    var bnd = 0
    while (bnd < numBands) {
      sb.setLength(0)
      var r = 0
      while (r < bandSize) {
        if (r > 0) sb.append('-')
        sb.append(mins(bnd * bandSize + r))
        r += 1
      }
      out(bnd) = UTF8String.fromString(sb.toString)
      bnd += 1
    }
    new GenericArrayData(out)
  }

  def minhashBands(gramHashes: Column, numHashes: Int, bandSize: Int): Column =
    ColumnBridge.column(MinHashBands(
      ColumnBridge.expression(gramHashes), numHashes, bandSize))
}
