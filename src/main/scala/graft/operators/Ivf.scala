package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.{arrayDot, l2Norm}

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to sign-bit LSH (sim_knn_lsh): a small coarse codebook
  * partitions vectors into cells; a probe scores only the vectors of
  * its `nprobe` nearest cells.
  *
  * Codebook here: per-label mean vectors (k = #labels, deterministic —
  * a k-means codebook drops in without changing the plan). Plan shape:
  * centroids are tiny and BROADCAST twice (assignment + probe routing);
  * the only shuffle is the per-cell candidate join keyed on cell_id —
  * at 100 TB this is the classic IVF sharding: cells are the partition
  * key, probes fan out to nprobe shards.
  */
object Ivf {

  /** Per-label centroid codebook: cell_id, c (array<double>), cnorm.
    *
    * Centroid elements are computed as ORDER-INDEPENDENT exact
    * decimal(28,14) sums divided as double, then quantized to 6 dp —
    * a coarse quantizer needs no more precision, and the quantization
    * makes the codebook bit-reproducible across engines/runs (shuffle
    * order no longer leaks into the cell assignment).
    */
  def codebook(vecs: DataFrame): DataFrame = {
    val cents = vecs
      .select(col("label").as("cell_id"), posexplode(col("v")))
      .groupBy(col("cell_id"), col("pos"))
      .agg(round(sum(col("col").cast("decimal(28,14)")).cast("double")
        / count(lit(1)), 6).as("m"))
      .groupBy(col("cell_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell_id"),
        expr("transform(pm, x -> x.m)").as("c"))
    cents.withColumn("cnorm", l2Norm(col("c")))
  }

  /** Assign each vector to its nearest-centroid cell (L2 argmin via
    * -2·v·c + c·c; v·v is constant per vector). Deterministic tie-break
    * on cell_id.
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("score",
        arrayDot(col("c"), col("c")) - arrayDot(col("v"), col("c")) * 2)
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell_id"), struct(col("score"), col("cell_id")))
        .as("cell_id"))

  /** [[assign]] carrying the vector columns THROUGH the argmin
    * aggregate (constant per vec_id, so first() is deterministic): the
    * index no longer re-joins the corpus against the assignment — the
    * sort-merge join and its two exchanges are deleted, the same
    * carried-vector pattern verified at 30× for [[KMeans]]
    * (sim_kmeans 11.3 → 7.9 s).
    */
  private[graft] def assignCarrying(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("score",
        arrayDot(col("c"), col("c")) - arrayDot(col("v"), col("c")) * 2)
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell_id"), struct(col("score"), col("cell_id")))
        .as("cell_id"), first(col("v")).as("v"),
        first(col("norm")).as("norm"))

  /** Top-k per probe over its nprobe nearest cells.
    *
    * Plan discipline (round-13 exchange diet, 23 → single digits):
    * the node frame, the codebook, and the assigned index each
    * localCheckpoint once per derivation — `vecs` feeds the codebook
    * AND the assignment, `cents` broadcasts twice (assignment + probe
    * routing), `indexed` feeds the probe filter AND the candidate
    * scan; without the checkpoints every consumer re-derives the whole
    * upstream chain (stage reuse covers only the exchange below it).
    * The candidate scan BROADCASTS the probe-routing side — at most
    * MaxProbes × nprobe ≈ 128 rows by construction — so the index is
    * scanned in place instead of being shuffled on cell_id: at 100 TB
    * the probes ship to the cells, never the reverse.
    *
    * Checkpoint lifecycle: each `search` call localCheckpoints the
    * corpus, codebook, and index fresh and does NOT unpersist them —
    * the single-shot-query contract every declared query follows (the
    * harness owns the session and sweeps storage between operators;
    * ScaleSmoke's per-op unpersist already covers the bench path). A
    * long-lived session issuing repeated searches should either sweep
    * `getPersistentRDDs` between calls or build the index ONCE and
    * reuse it — and on a real cluster a standing index belongs in the
    * bucketed materializer (durable, executor-loss-safe), not in
    * localCheckpoint blocks, which are unrecoverable on executor loss.
    */
  def search(spark: SparkSession, sfDir: String,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    val vecs = graft.queries.Tables.rebalance(
      graft.queries.Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2Norm(col("v")))
      .localCheckpoint()
    val cents = codebook(vecs).localCheckpoint() // k tiny rows
    // vec_id, cell_id, v, norm — assignment argmin with the vector
    // carried through (no corpus re-join)
    val indexed = assignCarrying(vecs, cents).localCheckpoint()

    // probe routing: nprobe nearest cells per probe — bounded probe
    // sample (at most SimilarityQueries.MaxProbes at any corpus size)
    val probes = indexed.filter(
        graft.queries.SimilarityQueries.probePred(col("vec_id")))
      .select(col("vec_id").as("probe_id"),
        col("v").as("pv"), col("norm").as("pnorm"))
    scanCandidates(indexed, routeProbes(cents, probes, nprobe), k)
  }

  /** Probe routing: the nprobe nearest cells per probe row
    * (probe_id, pv, pnorm) against a broadcast codebook. Shared by the
    * per-query [[search]] and the durable standing index
    * ([[graft.streaming.StreamingIvfIndex]]) — the standing index ALSO
    * turns the routed cells into a touched-shard set so its candidate
    * read is bucket-pruned.
    */
  private[graft] def routeProbes(cents: DataFrame, probes: DataFrame,
      nprobe: Int): DataFrame =
    probes.crossJoin(broadcast(cents))
      .withColumn("score",
        arrayDot(col("c"), col("c")) - arrayDot(col("pv"), col("c")) * 2)
      .withColumn("cr", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("score"), col("cell_id"))))
      .filter(col("cr") <= nprobe)
      .select(col("probe_id"), col("pv"), col("pnorm"), col("cell_id"))

  /** Exact brute-force cosine top-k of `probes` (probe_id, pv, pnorm)
    * over `indexed` (vec_id, v, norm) — the truth side of every ANN
    * recall gate (the sim_recall_report shape, factored so the standing
    * index's recall rows reuse it verbatim). Probe side broadcast,
    * index side scanned in place.
    */
  private[graft] def bruteTopK(indexed: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    broadcast(probes).as("p")
      .join(indexed.as("e"), col("p.probe_id") =!= col("e.vec_id"))
      .select(col("p.probe_id"), col("e.vec_id"),
        (arrayDot(col("p.pv"), col("e.v")) /
          (col("p.pnorm") * col("e.norm"))).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id"))
  }

  /** Mean recall@k of `got` against `truth` (both (probe_id, vec_id)
    * top-k row sets over the same probes): |got ∩ truth| / k averaged
    * over truth's probes.
    */
  private[graft] def recallAtK(got: DataFrame, truth: DataFrame,
      k: Int): Double = {
    val t = truth.select(col("probe_id"), col("vec_id"))
    val g = got.select(col("probe_id"), col("vec_id"))
    val overlap = t.join(g, Seq("probe_id", "vec_id"), "left_semi")
      .groupBy(col("probe_id")).agg(count(lit(1)).as("o"))
    t.select(col("probe_id")).distinct()
      .join(overlap, Seq("probe_id"), "left")
      .agg(avg(coalesce(col("o"), lit(0L)) / k.toDouble))
      .head().getDouble(0)
  }

  /** Candidate scan + top-k: only vectors in the probed cells; the
    * probe side is ≤ MaxProbes × nprobe rows — broadcast it so the
    * index side never shuffles.
    */
  private[graft] def scanCandidates(indexed: DataFrame,
      probeCells: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    broadcast(probeCells).as("p")
      .join(indexed.as("e"),
        col("p.cell_id") === col("e.cell_id") &&
          col("p.probe_id") =!= col("e.vec_id"))
      .select(col("p.probe_id"), col("e.vec_id"),
        (arrayDot(col("p.pv"), col("e.v")) /
          (col("p.pnorm") * col("e.norm"))).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("probe_id"), col("rnk"))
  }
}
