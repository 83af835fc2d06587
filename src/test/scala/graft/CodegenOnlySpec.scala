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

  test("all native expressions compile and evaluate under CODEGEN_ONLY") {
    // a parquet-backed scan, NOT Seq(...).toDF: Project over a
    // LocalRelation is constant-folded by ConvertToLocalRelation using
    // INTERPRETED eval at optimization time, so a broken doGenCode
    // passes undetected on local data — the round-2 trap, one layer up
    withCodegenOnly {
      val df = spark.read.parquet(s"$sf/documents.parquet")
        .filter(length(col("text")) >= 0)
        .select(
          col("doc_id"), col("text"),
          javaStringHash(col("text")).as("jh"),
          wordGramHashes(col("text"), 2, lit("p|")).as("grams"),
          clampedShingleHashes(col("text")).as("shingles"),
          minhashBands(clampedShingleHashes(col("text")), 16, 4).as("bands"))
      // the expressions must sit inside a WholeStageCodegen span — that
      // is the compile path whose failure silently de-optimizes
      assert("\\*\\(\\d+\\)".r
        .findFirstIn(df.queryExecution.executedPlan.toString).nonEmpty,
        df.queryExecution.executedPlan.toString)
      val rows = df.orderBy(col("doc_id")).limit(5).collect()
      assert(rows.length == 5)
      rows.foreach { r =>
        val text = r.getString(1)
        assert(r.getInt(2) == text.hashCode)
        val toks = text.trim.split(" ", -1).toSeq
        val grams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
          .toSeq.distinct.map(g => ("p|" + g).hashCode.toLong & 0xFFFFFFFFL)
        assert(r.getSeq[Long](3) == grams)
        assert(r.getSeq[Long](4).nonEmpty)    // clamp ⇒ ≥1 shingle
        assert(r.getSeq[String](5).length == 4)
      }

      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .filter(col("vec_id") >= 0)
        .select(col("vec_id"), arrayDot(col("v"), col("v")).as("dot"))
        .orderBy(col("vec_id")).limit(3).collect()
      assert(emb.length == 3 && emb.forall(_.getDouble(1) > 0))

      // sixth native expression: the bloom membership probe
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (0L until 10L).foreach(bloom.putLong)
      val probed = spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(graft.functions.BloomOps.mightContainLong(col("vec_id"), bloom))
        .select(col("vec_id")).orderBy(col("vec_id")).collect()
      // no false negatives: all of 0..9 that exist must survive
      assert(probed.map(_.getLong(0)).toSet.intersect((0L until 10L).toSet)
        == (0L until 10L).toSet)
    }
  }
}
