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

  test("PQ codes: 8 codes per vector, every code a valid codeword id") {
    import org.apache.spark.sql.functions._
    val codes = SparkEntry.queries("emb_pq_codes")(spark, sf)
    val n = queries.Tables.embeddings(spark, sf).count()
    assert(codes.count() == n * 8)
    val perVec = codes.groupBy(col("vec_id")).count()
      .filter(col("count") =!= 8).count()
    assert(perVec == 0, "every vector must emit exactly 8 subspace codes")
    val bad = codes.filter(col("code") < 0 || col("code") > 9).count()
    assert(bad == 0, "codes must be codeword ids 0..9")
  }

  test("PQ ADC: 5 ranked hits per probe, scores non-decreasing, no self-hit") {
    import org.apache.spark.sql.functions._
    val adc = SparkEntry.queries("emb_pq_adc")(spark, sf).collect()
    val byProbe = adc.groupBy(_.getLong(0))
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (probe, rows) =>
      assert(rows.length == 5, s"probe $probe: ${rows.length} hits")
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == Seq(1, 2, 3, 4, 5))
      val scores = byRank.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted, s"probe $probe: scores not ascending")
      assert(rows.forall(_.getLong(1) != probe), "self-hit leaked")
    }
  }

  // r17 verdict item 3: Ivf.Dims=64 is load-bearing for the one-pass
  // centroid aggregates (sum(element_at) silently skips nulls) — a
  // short vector must fail LOUDLY, not produce a silently-wrong mean.
  test("dims guard: a non-64-dim vector fails the centroid aggregates loudly") {
    import spark.implicits._
    def messages(t: Throwable): String = {
      var cur: Throwable = t
      val sb = new StringBuilder
      while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
      sb.toString
    }
    val bad = Seq(
      (1L, "a", Seq(1.0, 2.0)),
      (2L, "a", Seq.fill(Ivf.Dims)(0.5))).toDF("vec_id", "label", "v")
    val eCb = intercept[Throwable] { Ivf.codebook(bad).collect() }
    assert(messages(eCb).contains(s"expected ${Ivf.Dims}-dim vector"),
      s"codebook failed for the wrong reason: ${messages(eCb).take(500)}")
    val eMeans = intercept[Throwable] {
      graft.operators.KMeans.means(
        bad.select(lit(0L).as("cluster"), col("v"))).collect()
    }
    assert(messages(eMeans).contains(s"expected ${Ivf.Dims}-dim vector"),
      s"means failed for the wrong reason: ${messages(eMeans).take(500)}")
    // and conforming input still aggregates (the guard is pass-through)
    assert(Ivf.codebook(
      bad.filter(col("vec_id") === 2L)).collect().length == 1)
  }
}
