package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.arrayDot

/** Distributed Lloyd's k-means over an `array<double>` embedding column —
  * the clustering half of semantic dedup (SemDeDup-style) and the
  * trained-codebook upgrade path for the IVF/PQ operators ([[Ivf]] uses
  * per-label means as its codebook; `fit` produces the learned
  * equivalent with the identical centroid contract: 6 dp-quantized
  * exact-decimal means).
  *
  * Determinism: seeding is the k lowest-`vec_id` vectors (no RNG — a
  * k-means++ seed would need a random draw per round, which breaks
  * cross-engine reproducibility); assignment argmin expands squared L2
  * as c·c − 2·v·c (v·v constant per vector) with ties to the lowest
  * cluster id; recomputed means are ORDER-INDEPENDENT decimal(28,14)
  * sums divided as double and quantized to 6 dp, so shuffle order never
  * leaks into the next iteration's assignment.
  *
  * Scale (100 TB): centroids are k tiny rows — BROADCAST to the
  * assignment map, so each iteration is one scan + one partial-aggregated
  * shuffle keyed on (cluster, dim) for the means. Nothing is ever
  * collected to the driver; iteration count is a fixed small constant
  * (Lloyd's converges in quality, not correctness — training pipelines
  * run 5-25 iterations regardless of corpus size).
  */
object KMeans {

  /** Deterministic seed centroids: the k lowest-id vectors, cluster
    * id = rank 0..k-1. The global window runs over k rows only (the
    * limit is applied first).
    */
  def seed(vecs: DataFrame, k: Int): DataFrame =
    vecs.orderBy(col("vec_id")).limit(k)
      .withColumn("cluster",
        (row_number().over(graft.queries.Tables.tinyGlobalWindow(
          col("vec_id"))) - 1).cast("long"))
      .select(col("cluster"), col("v").as("c"))

  /** Nearest-centroid assignment: vec_id → cluster. */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("score",
        arrayDot(col("c"), col("c")) - arrayDot(col("v"), col("c")) * 2)
      .groupBy(col("vec_id"))
      .agg(min_by(col("cluster"), struct(col("score"), col("cluster")))
        .as("cluster"))

  /** [[assign]] with the vector carried THROUGH the argmin aggregate
    * (constant per vec_id, so first() is deterministic): the Lloyd
    * means no longer re-join the corpus against the assignment — one
    * join and one hash(vec_id) exchange deleted per training round,
    * the same normalizer-fold-out pattern as the round-10 model
    * aggregates and the round-11 dedup_semantic membership.
    */
  private def assignCarrying(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("score",
        arrayDot(col("c"), col("c")) - arrayDot(col("v"), col("c")) * 2)
      .groupBy(col("vec_id"))
      .agg(min_by(col("cluster"), struct(col("score"), col("cluster")))
        .as("cluster"), first(col("v")).as("v"))

  /** Recomputed per-cluster means (exact decimal, 6 dp-quantized) —
    * same centroid contract as [[Ivf.codebook]]. Clusters that lose
    * every member simply drop out (deterministic in both engines).
    * `asn` must carry the member vector (`v`) alongside `cluster`.
    */
  def means(asn: DataFrame): DataFrame =
    asn
      .select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(sum(col("col").cast("decimal(28,14)")).cast("double")
        / count(lit(1)), 6).as("m"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster"), expr("transform(pm, x -> x.m)").as("c"))

  /** `iters` Lloyd rounds from the deterministic seed; returns the
    * final (assignment, centroids). Centroids are localCheckpoint'ed
    * per round (k rows — pennies) so the lineage stays one-iteration
    * deep instead of nesting the full scan `iters` times.
    *
    * Convergence early-exit (the PageRank Δ=0 argument, applied to
    * Lloyd's): the next centroid set is a deterministic function of
    * the current one, and the 6 dp quantization makes equality EXACT —
    * if round k reproduces round k−1's centroids bit-for-bit, every
    * later round reproduces them too, so stopping emits exactly what
    * the full `iters` rounds (and the round-unrolled oracle) would.
    * The probe collects k tiny rows to the driver — iteration control,
    * not data movement (k ≪ 1000 regardless of corpus size). On the
    * fixture both k-means consumers settle well before their round
    * budget; a corpus that keeps drifting runs all `iters` rounds,
    * exactly as before.
    */
  def fit(vecs: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    def snapshot(c: DataFrame): Seq[(Long, Seq[Double])] =
      c.orderBy(col("cluster")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    var cents = seed(vecs, k).localCheckpoint()
    var prev = snapshot(cents)
    var converged = false
    for (_ <- 1 to iters if !converged) {
      cents = means(assignCarrying(vecs, cents)).localCheckpoint()
      val cur = snapshot(cents)
      converged = cur == prev
      prev = cur
    }
    (assign(vecs, cents), cents)
  }
}
