package graft

import org.apache.spark.sql.functions._

import graft.operators.KMeans
import graft.queries.{ClusteringQueries, Tables}

/** Structural invariants for the k-means / semantic-dedup operators —
  * the properties a correct Lloyd's iteration cannot violate, checked
  * independently of the DuckDB oracle hash.
  */
class ClusteringSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf).select(
    col("vec_id"),
    col("embedding").cast("array<double>").as("v"))

  test("every vector is assigned to exactly one cluster, ids in [0, k)") {
    val n = vecs.count()
    val (asn, _) = KMeans.fit(vecs, k = 8, iters = 2)
    val a = asn.cache()
    try {
      assert(a.count() === n)
      assert(a.select(col("vec_id")).distinct().count() === n)
      assert(a.filter(col("cluster") < 0 || col("cluster") >= 8).count() === 0)
    } finally a.unpersist()
  }

  test("an iteration never increases total within-cluster distortion") {
    def distortion(iters: Int): Double = {
      val (asn, cents) = KMeans.fit(vecs, k = 8, iters = iters)
      vecs.join(asn, "vec_id").join(cents, "cluster")
        .select(sum(
          graft.functions.VectorOps.arrayDot(col("v"), col("v"))
            - graft.functions.VectorOps.arrayDot(col("v"), col("c")) * 2
            + graft.functions.VectorOps.arrayDot(col("c"), col("c")))
          .as("d"))
        .head().getDouble(0)
    }
    val d1 = distortion(1)
    val d2 = distortion(2)
    // 6dp centroid quantization can nudge the objective by epsilon, so
    // allow equality plus a hair of slack — but never a real increase
    assert(d2 <= d1 * (1 + 1e-9), s"distortion rose: $d1 -> $d2")
  }

  test("semantic dedup: reps are members, near-dup counts bounded") {
    val rep = ClusteringQueries.defs("dedup_semantic").fn(spark, sf).cache()
    try {
      val ids = vecs.select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val rows = rep.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (repId, members, near) =
          (r.getAs[Long]("rep_vec_id"), r.getAs[Long]("n_members"),
            r.getAs[Long]("n_near_dup"))
        assert(ids.contains(repId))
        assert(near >= 0 && near <= members - 1)
      }
      // cluster membership totals must cover the whole corpus
      assert(rows.map(_.getAs[Long]("n_members")).sum === vecs.count())
    } finally rep.unpersist()
  }

  test("kmeans query is deterministic across independent runs") {
    val a = ClusteringQueries.defs("sim_kmeans").fn(spark, sf).collect()
    val b = ClusteringQueries.defs("sim_kmeans").fn(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
  }
}
