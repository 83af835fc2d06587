package graft

import org.apache.spark.sql.functions._

import graft.operators.Ivf

/** IVF ANN quality: the codebook partitions every vector exactly once,
  * and nprobe=2 search recalls a meaningful fraction of the exact
  * brute-force top-10 while scanning only ~2 cells of 10.
  */
class IvfSpec extends SparkSpec {

  test("every vector lands in exactly one cell") {
    val vecs = queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val cells = Ivf.assign(
      vecs.withColumn("norm", graft.functions.VectorOps.l2Norm(col("v"))),
      Ivf.codebook(vecs))
    assert(cells.count() == 500)
    assert(cells.select(col("vec_id")).distinct().count() == 500)
    assert(cells.select(col("cell_id")).distinct().count() <= 10)
  }

  test("nprobe=2 recall against exact brute-force top-10") {
    val ivf = Ivf.search(spark, sf, k = 10, nprobe = 2)
      .select(col("probe_id"), col("vec_id"))
    val exact = SparkEntry.queries("sim_knn_brute")(spark, sf)
      .select(col("probe_id"), col("vec_id"))
    val nExact = exact.count()
    val hit = ivf.intersect(exact).count()
    val recall = hit.toDouble / nExact
    assert(recall >= 0.3, s"recall@10 = $recall (hit $hit of $nExact)")
  }
}
