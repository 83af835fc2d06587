package graft

import org.apache.spark.sql.functions._

import graft.functions.ClampedShingleHashes.clampedShingleHashes
import graft.functions.JavaHash.javaStringHash
import graft.functions.MinHashBands.minhashBands
import graft.functions.VectorOps.arrayDot
import graft.functions.WordGramHashes.wordGramHashes

/** Codegen-compilation regression gate for the five native expressions.
  *
  * Spark's fallback from a failed codegen compile is SILENT: a broken
  * `doGenCode` (e.g. calling a Scala method whose default argument has
  * no Java-visible overload) de-optimizes the whole stage to
  * interpreted eval while every correctness test still passes — which
  * is exactly what happened to `WordGramHashes` in round 2. This suite
  * disables both escape hatches —
  * `spark.sql.codegen.fallback=false` (whole-stage compile errors
  * throw) and `spark.sql.codegen.factoryMode=CODEGEN_ONLY` (projection
  * factories never interpret) — so a non-compiling `doGenCode` fails
  * the build instead of shipping a multi-× CPU tax on the hot path.
  */
class CodegenOnlySpec extends SparkSpec {
  import spark.implicits._

  private def withCodegenOnly[A](body: => A): A = {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("all five native expressions compile and evaluate under CODEGEN_ONLY") {
    withCodegenOnly {
      val df = Seq(
        ("the quick brown fox jumps", Array(1.0, 2.0, 3.0), Array(0.5, 0.25, 2.0)),
        ("a a a", Array(0.0, -1.0, 4.0), Array(1.0, 1.0, 1.0)),
        ("", Array(2.5, 0.0, 0.0), Array(0.0, 3.0, 0.0)))
        .toDF("text", "va", "vb")
        // a filter keeps the expressions inside a WholeStageCodegen span
        .filter(length(col("text")) >= 0)
        .select(
          javaStringHash(col("text")).as("jh"),
          arrayDot(col("va"), col("vb")).as("dot"),
          wordGramHashes(col("text"), 2, lit("p|")).as("grams"),
          clampedShingleHashes(col("text")).as("shingles"),
          minhashBands(clampedShingleHashes(col("text")), 16, 4).as("bands"))

      val rows = df.collect()
      assert(rows.length == 3)

      // Spot-check values so a "compiles but wrong" codegen path also fails.
      val r0 = rows(0)
      assert(r0.getInt(0) == "the quick brown fox jumps".hashCode)
      assert(math.abs(r0.getDouble(1) - (1.0 * 0.5 + 2.0 * 0.25 + 3.0 * 2.0)) < 1e-9)
      assert(r0.getSeq[Long](2) ==
        Seq("the quick", "quick brown", "brown fox", "fox jumps")
          .map(g => ("p|" + g).hashCode.toLong & 0xFFFFFFFFL))
      assert(r0.getSeq[Long](3).nonEmpty)
      assert(r0.getSeq[String](4).length == 4)

      val r2 = rows(2)
      assert(r2.getSeq[Long](2).isEmpty)    // "" has no 2-grams
      assert(r2.getSeq[Long](3).length == 1) // clamp ⇒ at least one shingle
    }
  }
}
