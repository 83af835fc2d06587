package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale (100 TB): centroids are k tiny rows, and k is a fixed small
  * constant — so the argmin is evaluated PER ROW against a
  * driver-collected centroid snapshot (`least` over k codegen'd
  * score structs), never as a crossJoin × groupBy(vec) aggregate: the
  * assignment stage is a pure map with ZERO exchange at any corpus
  * size (r17 optimization, guide §2.4 — the old crossJoin(broadcast) +
  * min_by shape paid a corpus-wide hash(vec_id) shuffle carrying the
  * full vector payload per Lloyd round). The k-row snapshot collect is
  * iteration CONTROL (the same k rows the convergence probe always
  * collected), not data movement; each Lloyd round is exactly ONE
  * distributed job (the partial-aggregated means shuffle, keyed on
  * (cluster, dim)). Iteration count is a fixed small constant
  * (Lloyd's converges in quality, not correctness — training pipelines
  * run 5-25 iterations regardless of corpus size).
  */
object KMeans {

  /** Driver-side left-to-right self-dot — bit-identical to the codegen
    * [[graft.functions.ArrayDot]] loop (same element order, same
    * doubles), so a literal c·c equals the old runtime `array_dot(c,c)`
    * exactly.
    */
  private[graft] def selfDot(c: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Per-row nearest-centroid entry over a driver-collected centroid
    * snapshot: `least` over one `struct(score, cluster[, c])` per
    * centroid, score = c·c − 2·v·c with c·c folded to a literal.
    * `least(struct(...))` is the exact `min_by(_, struct(score,
    * cluster))` ordering (lexicographic; cluster ids are distinct, so
    * the tie-break never reaches a later field) — results are
    * bit-identical to the old crossJoin + min_by argmin, with zero
    * exchange and whole-stage codegen throughout ([[ArrayDot]] is a
    * codegen expression; `least`/`struct` are codegen-native).
    *
    * @param carryCentroid also carry the winning centroid vector as
    *   field `c` (the consumer-side fold that deletes the
    *   centroid re-join in dedup_semantic).
    */
  private[graft] def nearest(snap: Seq[(Long, Seq[Double])], v: Column,
      carryCentroid: Boolean = false): Column = {
    require(snap.nonEmpty, "empty centroid snapshot")
    val entries = snap.sortBy(_._1).map { case (cid, c) =>
      val score = (lit(selfDot(c)) - arrayDot(v, typedlit(c)) * 2).as("score")
      val base = Seq(score, lit(cid).as("cluster"))
      struct(
        (if (carryCentroid) base :+ typedlit(c).as("c") else base): _*)
    }
    if (entries.size == 1) entries.head else least(entries: _*)
  }

  /** Deterministic seed snapshot: the k lowest-`vec_id` vectors,
    * cluster id = rank 0..k-1 (driver-side sort of the collected k
    * rows pins the order independent of TakeOrdered's internals).
    */
  private def seedSnapshot(vecs: DataFrame, k: Int): Seq[(Long, Seq[Double])] =
    vecs.select(col("vec_id"), col("v")).orderBy(col("vec_id")).limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
      .zipWithIndex
      .map { case ((_, v0), i) => (i.toLong, v0) }
      .toSeq

  /** Nearest-centroid assignment: vec_id → cluster (per-row argmin,
    * zero exchange). Kept for API parity with the old DataFrame-cents
    * signature via [[fit]]; spec instrument.
    */
  private[graft] def assign(vecs: DataFrame,
      snap: Seq[(Long, Seq[Double])]): DataFrame =
    vecs.select(col("vec_id"),
      nearest(snap, col("v")).getField("cluster").as("cluster"))

  /** Recomputed per-cluster means (exact decimal, 6 dp-quantized) —
    * same centroid contract as [[Ivf.codebook]], and the same r17
    * one-pass shape: per-dim decimal sums as [[Ivf.Dims]] parallel
    * aggregate expressions in ONE HashAggregate — one exchange of k
    * wide rows instead of a posexplode (64× rows through a Generate)
    * plus two keyed exchanges and a collect_list/array_sort rebuild.
    * Decimal sums are order-independent, so centroids are
    * bit-identical to the explode formulation on uniform-dims input.
    * Clusters that lose every member simply drop out (deterministic
    * in both engines). `asn` must carry the member vector (`v`)
    * alongside `cluster`.
    */
  def means(asn: DataFrame): DataFrame = {
    val sums = (1 to Ivf.Dims).map(i =>
      sum(element_at(col("v"), i).cast("decimal(28,14)")).as(s"_s$i"))
    asn
      // loud dims guard — see [[Ivf.dimsChecked]]: a short vector must
      // fail the task, not silently skip its null tail out of the sums
      .withColumn("v", Ivf.dimsChecked(col("v")))
      .groupBy(col("cluster"))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("_n")): _*)
      .select(col("cluster"),
        array((1 to Ivf.Dims).map(i =>
          round(col(s"_s$i").cast("double") / col("_n"), 6)): _*).as("c"))
  }

  /** `iters` Lloyd rounds from the deterministic seed, as centroid
    * SNAPSHOTS: each round is one distributed job (the means
    * aggregation, collected — k·dims tiny values) over a per-row
    * assignment of the previous snapshot. No per-round checkpoint, no
    * lineage growth — round n's plan reads the corpus once against
    * literal centroids.
    *
    * Convergence early-exit (the PageRank Δ=0 argument, applied to
    * Lloyd's): the next centroid set is a deterministic function of
    * the current one, and the 6 dp quantization makes equality EXACT —
    * if round k reproduces round k−1's centroids bit-for-bit, every
    * later round reproduces them too, so stopping emits exactly what
    * the full `iters` rounds (and the round-unrolled oracle) would.
    */
  private[graft] def fitSnapshot(vecs: DataFrame, k: Int,
      iters: Int): Seq[(Long, Seq[Double])] = {
    var prev = seedSnapshot(vecs, k)
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val asn = vecs.select(
        nearest(prev, col("v")).getField("cluster").as("cluster"), col("v"))
      val cur = means(asn).orderBy(col("cluster")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      converged = cur == prev
      prev = cur
    }
    prev
  }

  /** `iters` Lloyd rounds from the deterministic seed; returns the
    * final (assignment, centroids). The assignment is the zero-exchange
    * per-row argmin; the centroid frame is rebuilt from the final
    * snapshot (k tiny local rows — no lineage at all).
    */
  def fit(vecs: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val snap = fitSnapshot(vecs, k, iters)
    val session = vecs.sparkSession
    import session.implicits._
    (assign(vecs, snap), snap.toDF("cluster", "c"))
  }
}
