package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalKernel
import graft.operators.MultimodalKernel.{MediaFeatures, MediaRow}

/** The batch-kernel contract: batching shape, kernel swap, and
  * equivalence with the expression-computed statistics.
  */
class MultimodalKernelSpec extends SparkSpec {
  import spark.implicits._

  test("kernel receives fixed-size batches covering every row once") {
    val rows = MultimodalKernel.mediaRows(spark, sf)
    val batchSizes = rows.mapPartitions { it =>
      it.grouped(16).map(_.size)
    }.collect()
    assert(batchSizes.sum == 500)
    assert(batchSizes.forall(_ <= 16))
  }

  test("stub decode features match independently computed statistics") {
    val viaKernel = MultimodalKernel.features(spark, sf)
      .select(col("doc_id"), col("n_bytes"), col("mean_byte"))
    val expected = queries.Tables.documents(spark, sf)
      .select(col("doc_id"),
        length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"),
        (expr("aggregate(transform(split(text, ''), c -> ascii(c)), 0L, (a, x) -> a + cast(x as long))")
          .cast("double") / length(col("text"))).as("mean_byte"))
      .orderBy(col("doc_id"))
    assert(viaKernel.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(viaKernel).count() == 0)
  }

  test("a swapped kernel flows through the same operator unchanged") {
    val constKernel: MultimodalKernel.DecodeKernel = batch =>
      batch.map(r => MediaFeatures(r.doc_id, 1L, 1, 1, 1.0, 1))
    val out = MultimodalKernel.decodeFeatures(
      MultimodalKernel.mediaRows(spark, sf), constKernel, batchSize = 8)
    assert(out.count() == 500)
    assert(out.filter(col("n_bytes") === 1L).count() == 500)
  }
}
