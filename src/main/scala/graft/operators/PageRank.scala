package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Power-iteration PageRank (damping 0.85) in integer fixed-point
  * rank-micros (1e6 = rank 1.0): per-edge contribution is
  * floor(rank/deg) and the damping update is 150000 + (85·Σ)//100, so
  * every engine — and every task retry — produces the same bits, no
  * float-sum order dependence anywhere. The DuckDB oracle unrolls the
  * identical rounds as chained CTEs (see `graph_pagerank`).
  *
  * The rank vector is SPLIT ONCE into its static and dynamic parts,
  * which removes the per-round rank-update join entirely:
  *
  *   - nodes with no in-edges (isolated, or source-only in a directed
  *     feed) hold rank 150000 from round 1 forever — computed once,
  *     unioned into the result (and, for source-only nodes, into the
  *     contribution input) as constants;
  *   - every other node receives ≥ 1 contribution EVERY round (the
  *     edge set is static), so the contribution sum's key set is
  *     exactly the dynamic node set and the next iterate is a pure
  *     projection of the sum — no join, no coalesce.
  *
  * Per round that leaves ONE broadcast (the rank vector — orders of
  * magnitude smaller than the edge set) + ONE map-side-combined
  * shuffle (the contribution sum). Convergence early-exit compares
  * consecutive CHECKPOINTS (round i vs i−2): the update is
  * deterministic, so x_i = x_{i−2} makes the tail periodic with
  * period dividing 2, and the exit fires only when the REMAINING
  * round count is even — the emitted bits are identical to running
  * every round (and to the unrolled oracle).
  *
  * Two physical regimes, chosen at runtime by the node count (an
  * over-ceiling broadcast hint FAILS the job rather than falling
  * back, so the fallback must be runtime — see
  * [[ConnectedComponents.BroadcastNodeLimit]]):
  *
  *   - UNDER the gate: rank broadcasts each round, and the edge table
  *     is hash-partitioned on `dst` — the AGGREGATION key — and
  *     persisted once, so each round is ONE zero-exchange stage
  *     (cached scan → broadcast join → contribution sum riding the
  *     cached layout); iterates truncate lineage via localCheckpoint.
  *   - PAST the gate (> 50 M nodes): the degree-annotated edge table
  *     is hash-partitioned on `src`, sorted, and PERSISTED once — an
  *     InMemoryRelation preserves both partitioning and ordering, so
  *     every round's edge⋈rank join is a zero-exchange zero-sort
  *     merge on the edge side (localCheckpoint would drop the layout
  *     under AQE, hence cache). The rank iterates persist
  *     id-partitioned. Per-iteration network cost is O(|V|) — the
  *     contribution shuffle — never O(|E|): the edge table is
  *     exchanged exactly once for the whole run.
  */
object PageRank {

  /** The iteration-invariant inputs, exposed so plan specs can assert
    * one round's physical shape: the cached edge table (hash(dst)
    * under the gate, carrying no degree column; degree-annotated and
    * co-partitioned+sorted on `src` past it), the initial rank vector
    * over the CONTRIBUTING (src) nodes, the per-round rank-side
    * wrapper (under the gate: attach the degree to the tiny rank
    * vector, then broadcast; past the gate: identity — `dg` lives in
    * the edge table, and `round`'s `rank div dg` resolves from
    * whichever side carries it), the regime flag, and the two static
    * rank parts (source-only nodes — `None`
    * for a caller-declared symmetric graph, where every src is also a
    * dst by construction — joined into every post-first-round
    * iterate; no-edge nodes, unioned into the final result).
    */
  def prepare(nodes: DataFrame, edges: DataFrame,
      broadcastNodeLimit: Long = ConnectedComponents.BroadcastNodeLimit,
      symmetric: Boolean = false)
      : (DataFrame, DataFrame, DataFrame => DataFrame, Boolean,
        Option[DataFrame], DataFrame) = {
    val timing = nodes.sparkSession.conf
      .getOption("spark.graft.graph.timing").contains("true")
    def t[T](tag: String)(f: => T): T = {
      val s0 = System.nanoTime()
      val r = f
      if (timing) println(
        f"[pagerank] prepare $tag ${(System.nanoTime() - s0) / 1e9}%.2f s")
      r
    }
    val underGate = t("node-count")(nodes.count() <= broadcastNodeLimit)
    val bh = ConnectedComponents.hintIf(underGate)
    // the static split: src nodes at the initial rank feed round 1;
    // source-only nodes (∉ dst) freeze at 150000 after round 1 but
    // keep contributing; nodes with no edges at all freeze likewise
    // and only appear in the result. A symmetric graph (every edge
    // present in both directions) has src set == dst set, so the
    // source-only part is empty BY CONSTRUCTION and the no-edge part
    // is a single anti-join against the degree keys — the dst-distinct
    // materialization and the runtime emptiness probe both disappear.
    def staticSplit(ed: DataFrame, deg: DataFrame)
        : (Option[DataFrame], DataFrame) =
      if (symmetric)
        (None,
          nodes.join(deg.select(col("src").as("id")), Seq("id"),
            "left_anti").withColumn("rank", lit(150000L)))
      else {
        val dstIds = ed.select(col("dst").as("id")).distinct()
          .localCheckpoint()
        val so = deg.select(col("src").as("id"))
          .join(dstIds, Seq("id"), "left_anti")
          .withColumn("rank", lit(150000L))
          .localCheckpoint()
        (if (so.isEmpty) None else Some(so),
          nodes
            .join(dstIds, Seq("id"), "left_anti")
            .join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
            .withColumn("rank", lit(150000L)))
      }
    if (underGate) {
      // ONE edge materialization: the hash(dst) exchange IS the cache
      // — the caller's edge pipeline (often an expensive LSH pair
      // derivation) executes exactly once, with no intermediate
      // checkpoint of the raw union. dst is the AGGREGATION key: the
      // rank side broadcasts, so the per-round join imposes no
      // distribution requirement, and hash(dst) is what the
      // contribution sum needs — every round's groupBy(dst) rides the
      // cached layout with NO exchange (InMemoryRelation preserves
      // partitioning; localCheckpoint would drop it under AQE — the
      // past-gate pattern, keyed on dst instead of src). The degree
      // joins onto the TINY rank vector at broadcast-build time
      // (folded into `bh`) instead of widening the |E|-row cache.
      val edc = t("edge-copart") {
        val c = edges.repartition(col("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        c.count()
        c
      }
      val deg = t("degree-ckpt")(
        edc.groupBy(col("src")).agg(count(lit(1)).as("dg"))
          .localCheckpoint())
      val (srcOnlyConst, isolatedConst) = staticSplit(edc, deg)
      val init = deg.select(col("src").as("id"))
        .withColumn("rank", lit(1000000L))
      val degAtt = deg.select(col("src").as("id"), col("dg"))
      (edc, init, df => bh(df.join(degAtt, "id")), true,
        srcOnlyConst, isolatedConst)
    } else {
      // past the gate the rank CANNOT broadcast, so the join key (src)
      // dictates the layout and the degree folds into the edge table
      // ONCE (hash-agg + join — an all-rows window sort over |E|
      // measured ~30% slower, a chunked adjacency-list layout ~15%
      // slower; reading `edges` lazily in both consumers ~20% slower
      // than checkpointing: exchange reuse does not cover the
      // upstream pair generation)
      val ed = t("edges-ckpt")(edges.localCheckpoint())
      val deg = t("degree-ckpt")(
        ed.groupBy(col("src")).agg(count(lit(1)).as("dg"))
          .localCheckpoint())
      val (srcOnlyConst, isolatedConst) = staticSplit(ed, deg)
      val init = deg.select(col("src").as("id"))
        .withColumn("rank", lit(1000000L))
      val edc = ed.join(deg, "src").repartition(col("src"))
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      edc.count() // pay the one-time edge exchange + sort NOW
      val pr0 = init.repartition(col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pr0.count()
      (edc, pr0, bh, false, srcOnlyConst, isolatedConst)
    }
  }

  /** One power-iteration round: the contribution sum and the next
    * DYNAMIC iterate (a pure projection of the sum — every dynamic
    * node receives contributions every round, see the object doc).
    */
  def round(edc: DataFrame, pr: DataFrame,
      bh: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val sums = edc.join(bh(pr), edc("src") === pr("id"))
      .select(col("dst"), expr("rank div dg").as("contrib"))
      .groupBy(col("dst")).agg(sum(col("contrib")).as("c"))
    val next = sums.select(col("dst").as("id"),
      (lit(150000L) + expr("85 * c div 100")).as("rank"))
    (sums, next)
  }

  /** Run `rounds` iterations over `nodes` (`id`) and directed `edges`
    * (`src`, `dst` — symmetrize first for an undirected graph).
    * Returns (`id`, `rank`) in rank-micros for every node.
    */
  def run(nodes: DataFrame, edges: DataFrame, rounds: Int = 10,
      broadcastNodeLimit: Long =
        ConnectedComponents.BroadcastNodeLimit,
      symmetric: Boolean = false): DataFrame = {
    require(rounds >= 1, "pagerank needs at least one round")
    val (edc, pr0, bh, underGate, srcOnlyConst, isolatedConst) =
      prepare(nodes, edges, broadcastNodeLimit, symmetric)
    val timing = nodes.sparkSession.conf
      .getOption("spark.graft.graph.timing").contains("true")
    var tRound = System.nanoTime()
    var pr = pr0
    // the previous two persisted iterates (probe base + past-gate
    // cache bookkeeping): the convergence probe compares against the
    // one-checkpoint-back materialized frame, never a lazy plan
    var prevCk: Option[DataFrame] = None
    var grandCk: Option[DataFrame] = None
    var converged = false
    for (i <- 1 to rounds if !converged) {
      val (_, next0) = round(edc, pr, bh)
      // post-round-1 contribution input: dynamic iterate + the frozen
      // source-only constants (None for a symmetric graph — skipping
      // the union also preserves, past the gate, the contribution
      // sum's id-partitioning into the next round's join)
      val next = srcOnlyConst.fold(next0)(next0.unionByName(_))
      // materialize every OTHER round: two rounds of lineage stay
      // re-plannable, and halving the barriers cuts fixed cost
      pr = if (i % 2 == 0 || i == rounds) {
        val ck =
          if (underGate) next.localCheckpoint()
          else {
            val c = next.persist(StorageLevel.MEMORY_AND_DISK)
            c.count()
            c
          }
        // exact early exit: x_i == x_{i-2} makes the tail periodic
        // with period | 2, so stopping is bit-identical IFF the
        // remaining round count is even. At i == rounds the loop ends
        // either way — probing there would be a pure wasted join job.
        converged = i < rounds && (rounds - i) % 2 == 0 && prevCk.exists(p =>
          ck.join(p.withColumnRenamed("rank", "prev_rank"), "id")
            .filter(col("rank") =!= col("prev_rank")).isEmpty)
        if (!underGate) {
          if (prevCk.isEmpty) pr0.unpersist() // superseded by first ck
          grandCk.foreach(_.unpersist())
        }
        grandCk = prevCk
        prevCk = Some(ck)
        ck
      } else next
      if (timing) {
        println(f"[pagerank] round $i ${(System.nanoTime() - tRound) / 1e9}%.2f s converged=$converged")
        tRound = System.nanoTime()
      }
    }
    // the final iterate is a materialized checkpoint and the static
    // parts read only checkpointed/deg inputs — the cached edge table
    // is dead weight from here on; release it so back-to-back runs in
    // a long-lived session don't accumulate |E|-row cache entries
    edc.unpersist()
    pr.unionByName(isolatedConst)
  }
}
