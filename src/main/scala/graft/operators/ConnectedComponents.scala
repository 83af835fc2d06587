package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — turns
  * near-duplicate candidate PAIRS into duplicate CLUSTERS (every doc
  * labeled with the smallest doc id reachable through the pair graph;
  * singletons label themselves).
  *
  * Algorithm: each round, every vertex takes the min of its own label
  * and its neighbors' labels; stops when no label changes. Rounds needed
  * = graph diameter (tiny for dedup graphs — near-dup components are
  * shallow). The "own label" term rides a TAGGED SELF-LOOP row per
  * vertex baked into the edge cache, so each round is ONE Spark job —
  * and, under the broadcast gate, ONE exchange-free stage: the cache
  * is hash-partitioned on `dst` (the aggregation key; labels
  * broadcast, so the join imposes no distribution), and the self row's
  * contribution doubles as the vertex's previous label, letting the
  * changed-label count ride the same materialization as an observed
  * metric (`Observation`) — no separate convergence-check job. Past
  * the gate the cache is keyed+sorted on `src` (the join key), so a
  * round exchanges the O(|V|) label table and the contribution sum,
  * never the edge set. `localCheckpoint` truncates the growing
  * lineage so round N's plan doesn't replay rounds 1..N-1 — the
  * standard iterative-algorithm pattern on DataFrames
  * (large-star/small-star is the same loop with smarter edge rewriting
  * for web-scale graphs).
  */
object ConnectedComponents {

  /** @param vertices single column `id` (long)
    * @param edges two columns `a`, `b` (long pairs, either orientation)
    * @return `id`, `cluster_id` = min id in the component
    */
  /** Per-node tables (labels / min-neighbor) are broadcast only while
    * the node count stays at or below this; beyond it the hints are
    * DROPPED automatically for shuffled joins. The gate exists because
    * an explicit `broadcast()` hint bypasses
    * `autoBroadcastJoinThreshold` entirely — beyond Spark's 8 GB /
    * 512M-row broadcast ceiling the job FAILS or OOMs the driver
    * rather than degrading, so "drop the hint at scale" must be a
    * runtime decision, not a comment. 50M rows of (id, comp) longs is
    * ~1–2 GB broadcast — conservative against both ceilings.
    */
  val BroadcastNodeLimit = 50000000L

  /** The broadcast gate as a plan transform: `hintIf(n <= limit)` is
    * `broadcast` below the gate and `identity` past it. Shared by the
    * pagerank / triangle-census node-table hints in DedupQueries.
    */
  def hintIf(smallEnough: Boolean): DataFrame => DataFrame =
    if (smallEnough) (df: DataFrame) => broadcast(df) else identity

  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 20,
      knownVertexCount: Option[Long] = None): DataFrame =
    runCounted(vertices, edges, maxIter,
      knownVertexCount = knownVertexCount)._1

  /** [[run]] plus the number of propagation rounds executed (diameter
    * rounds to converge + one round that observes zero changes).
    *
    * `knownVertexCount`: the broadcast gate needs only |V|; a caller
    * whose vertex set is a base-table projection can pass the parquet
    * footer count ([[graft.queries.Tables.parquetRowCount]]) and skip
    * the gate's cluster count() job (r17 — the job floor is the
    * dominant cost of a gate probe at bench scale, and a driver-side
    * metadata read is free at any scale).
    */
  def runCounted(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20,
      broadcastNodeLimit: Long = BroadcastNodeLimit,
      knownVertexCount: Option[Long] = None): (DataFrame, Int) = {
    val underGate =
      knownVertexCount.getOrElse(vertices.count()) <= broadcastNodeLimit
    // the label table is one row per NODE (≪ edges for candidate
    // graphs) — broadcasting it keeps the cached edge set unshuffled
    // every round. The hint is GATED on the node count (see
    // BroadcastNodeLimit): past the gate the hint is dropped instead
    // of failing on an over-ceiling broadcast.
    val bh = hintIf(underGate)
    // Edge cache: both orientations PLUS a TAGGED self-loop per
    // vertex. The self row does double duty — it carries the vertex's
    // own label into the min (the "keep my label" term the old
    // labels-union supplied) AND delivers the OLD label next to the
    // new min, so the changed-count observation still rides the same
    // single job per round. Requires every edge endpoint to appear in
    // `vertices` (every caller builds edges over the vertex table).
    val edc = minLabelEdges(vertices, edges, underGate)
    var labels = vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val merged = minLabelRound(edc, labels, bh)
      val obs = Observation()
      val next = merged
        .observe(obs, count(when(col("comp") =!= col("old"), 1)).as("changed"))
        .select(col("dst").as("id"), col("comp"))
        .localCheckpoint() // eager: the one job per round; obs fills here
      val changed = obs.get("changed").asInstanceOf[Long]
      labels = next
      converged = changed == 0
      iter += 1
    }
    edc.unpersist() // labels are checkpointed; the cache is dead weight
    (labels.select(col("id"), col("comp").as("cluster_id")), iter)
  }

  /** The min-label edge cache (exposed for plan specs): ONE edge
    * materialization, keyed for the regime (the PageRank pattern) —
    * under the gate hash(dst), the AGGREGATION key, so every round's
    * groupBy(dst) rides the cached layout with NO exchange (labels
    * broadcast, so the join imposes nothing); past the gate
    * hash(src)+sort, the JOIN key, so each round exchanges only the
    * O(|V|) label table and the contribution sum, never the edge set.
    */
  private[graft] def minLabelEdges(vertices: DataFrame, edges: DataFrame,
      underGate: Boolean): DataFrame = {
    val bi = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .withColumn("self", lit(false))
      .unionByName(vertices.select(col("id").as("src"),
        col("id").as("dst"), lit(true).as("self")))
    // clamp the cached layout at the scheduler core count (the
    // PageRank edgeParts lesson): the loop scans this exact layout
    // once per round, and a 64-task cache on 32 cores pays two
    // scheduling waves per round for zero parallelism gain. AQE
    // cannot re-coalesce an explicitly repartitioned cached plan.
    val parts = math.min(
      vertices.sparkSession.sessionState.conf.numShufflePartitions,
      vertices.sparkSession.sparkContext.defaultParallelism)
    val keyed =
      if (underGate) bi.repartition(parts, col("dst"))
      else bi.repartition(parts, col("src")).sortWithinPartitions("src")
    val c = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    c.count()
    c
  }

  /** One propagation round pre-observation (exposed for plan specs):
    * per dst the new min label next to the old one (delivered by the
    * tagged self row).
    */
  private[graft] def minLabelRound(edc: DataFrame, labels: DataFrame,
      bh: DataFrame => DataFrame): DataFrame =
    edc.join(bh(labels), edc("src") === labels("id"))
      .select(col("dst"), col("comp"), col("self"))
      .groupBy(col("dst"))
      .agg(min(col("comp")).as("comp"),
        max(when(col("self"), col("comp"))).as("old"))

  /** Web-scale path: alternating large-star/small-star edge rewriting
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14). Min-label propagation above needs DIAMETER rounds — fine
    * for shallow near-dup graphs, quadratic-ish pain on a chain-shaped
    * component. The star operations rewrite the edge set itself so path
    * lengths halve each alternation: O(log n) rounds on any topology.
    *
    * large-star: every node attaches its LARGER neighbors to the
    * smallest node it can see (`min(Γ(u) ∪ {u})`).
    * small-star: every node attaches its smaller-or-equal neighbors
    * (and itself) to that same minimum.
    * Both are a groupBy-min plus a join — no per-node neighbor lists are
    * ever materialized, so a 10⁹-degree hub node costs a shuffle, not
    * executor memory. At the fixed point every component is a star
    * rooted at its minimum id.
    */
  def runStar(vertices: DataFrame, edges: DataFrame, maxIter: Int = 35,
      knownVertexCount: Option[Long] = None): DataFrame =
    runStarCounted(vertices, edges, maxIter,
      knownVertexCount = knownVertexCount)._1

  /** [[runStar]] plus the number of large+small alternations executed.
    * `knownVertexCount`: see [[runCounted]]. */
  def runStarCounted(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 35,
      broadcastNodeLimit: Long = BroadcastNodeLimit,
      knownVertexCount: Option[Long] = None): (DataFrame, Int) = {
    // canonical orientation: u > v, self-loops dropped
    var e = edges
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    // minNbr/minS are bounded by the (shrinking) node set — gate their
    // broadcast hints on the initial vertex count (BroadcastNodeLimit:
    // an over-ceiling hint fails, it does not degrade)
    val bh = hintIf(
      knownVertexCount.getOrElse(vertices.count()) <= broadcastNodeLimit)
    var iter = 0
    var converged = e.isEmpty
    var prevCount = -1L
    var prevSum = 0L
    while (!converged && iter < maxIter) {
      // ---- large-star ----
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val minNbr = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // node-sized: the planner-time broadcast hint saves the big
      // side's shuffle WRITE (AQE's runtime conversion only localizes
      // the read — the map stage has already paid)
      val large = sym.join(bh(minNbr), "u")
        .where(col("v") > col("u"))
        // v > u >= m, so (v, m) is already canonically oriented
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // ---- small-star (input already u > v, so min(Γ⁻(u) ∪ {u}) = min v) ----
      val minS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large.join(bh(minS), "u")
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(minS.select(col("u").as("a"), col("m").as("b")))
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // convergence = edge-set fixed point, observed during the same
      // materialization (count + order-independent xxhash64 checksum)
      val obs = Observation()
      val next = small
        .observe(obs, count(lit(1)).as("cnt"),
          // mask to 28 bits before the ANSI-checked sum: full-range
          // xxhash64 longs overflow; 2^28 × 10^10 edges still fits
          coalesce(sum(xxhash64(col("u"), col("v"))
            .bitwiseAND(lit(0xFFFFFFFL))), lit(0L)).as("sum"))
        .localCheckpoint()
      val cnt = obs.get("cnt").asInstanceOf[Long]
      val sumH = obs.get("sum").asInstanceOf[Long]
      converged = cnt == prevCount && sumH == prevSum
      prevCount = cnt
      prevSum = sumH
      e = next
      iter += 1
    }
    // fixed point: each non-root points straight at its component min
    val roots = e.groupBy(col("u")).agg(min(col("v")).as("root"))
    val labels = vertices
      .join(roots, vertices("id") === roots("u"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster_id"))
    (labels, iter)
  }
}
