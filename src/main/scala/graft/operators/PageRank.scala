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
  * Convergence early-exit: the update is a deterministic function
  * next = f(prev) of the whole rank vector, so the integer formulation
  * has an EXACT fixed point — if round k produces bit-identical ranks
  * to round k−1, every later round reproduces them, and stopping at k
  * emits the same bits the full run would. The probe rides the rounds
  * that already materialize.
  *
  * Two physical regimes, chosen at runtime by the node count (an
  * over-ceiling broadcast hint FAILS the job rather than falling
  * back, so the fallback must be runtime — see
  * [[ConnectedComponents.BroadcastNodeLimit]]):
  *
  *   - UNDER the gate: the rank vector (one row per node, orders of
  *     magnitude smaller than the edge set) is broadcast each round,
  *     so the big edge table is never exchanged and the only per-round
  *     shuffle is the map-side-combined contribution sum (≤ |V| rows
  *     after partial aggregation). Iterates truncate lineage via
  *     localCheckpoint.
  *   - PAST the gate (> 50 M nodes): the degree-annotated edge table
  *     is hash-partitioned on `src`, SORTED within partitions, and
  *     PERSISTED once — an InMemoryRelation preserves both the
  *     partitioning and the ordering, so every round's edge⋈rank
  *     sort-merge join consumes the cache with ZERO exchange and ZERO
  *     sort on the edge side. The rank iterates persist (cache, not
  *     localCheckpoint, which drops partitioning under AQE) so the
  *     update join's id-partitioned output carries into the next
  *     round. Per-iteration network cost is O(|V|) — the contribution
  *     shuffle — never O(|E|): at 100 TB edge scale the edge table is
  *     exchanged exactly once for the whole run, which is the
  *     difference between an iteration and a re-load.
  */
object PageRank {

  /** The iteration-invariant inputs, exposed so plan specs can assert
    * the physical shape of one round: the degree-annotated edge table
    * (`src`, `dst`, `dg` — cached co-partitioned+sorted on `src` past
    * the gate), the initial rank vector (`id`, `rank`), the broadcast
    * hint (identity past the gate), and the regime flag.
    */
  def prepare(nodes: DataFrame, edges: DataFrame,
      broadcastNodeLimit: Long = ConnectedComponents.BroadcastNodeLimit)
      : (DataFrame, DataFrame, DataFrame => DataFrame, Boolean) = {
    val underGate = nodes.count() <= broadcastNodeLimit
    val bh = ConnectedComponents.hintIf(underGate)
    val ed = edges.localCheckpoint()
    // degree folds into the edge table ONCE: a per-round join(deg)
    // would re-aggregate and re-shuffle degrees every iteration
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("dg"))
    val edc0 = ed.join(deg, "src")
    if (underGate) {
      val edc = edc0.localCheckpoint()
      val pr0 = nodes.withColumn("rank", lit(1000000L)).localCheckpoint()
      (edc, pr0, bh, true)
    } else {
      val edc = edc0.repartition(col("src"))
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      edc.count() // pay the one-time edge exchange + sort NOW
      val pr0 = nodes.withColumn("rank", lit(1000000L))
        .repartition(col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pr0.count()
      (edc, pr0, bh, false)
    }
  }

  /** One power-iteration round: the contribution sum and the updated
    * rank vector (carrying `prev_rank` for the convergence probe).
    */
  def round(edc: DataFrame, pr: DataFrame,
      bh: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val sums = edc.join(bh(pr), edc("src") === pr("id"))
      .select(col("dst"), expr("rank div dg").as("contrib"))
      .groupBy(col("dst")).agg(sum(col("contrib")).as("c"))
    val next = pr.join(bh(sums), pr("id") === sums("dst"), "left")
      .select(col("id"), col("rank").as("prev_rank"),
        (lit(150000L) + expr("85 * coalesce(c, 0L) div 100"))
          .as("rank"))
    (sums, next)
  }

  /** Run up to `rounds` iterations over `nodes` (`id`) and directed
    * `edges` (`src`, `dst` — symmetrize first for an undirected
    * graph). Returns (`id`, `rank`) in rank-micros.
    */
  def run(nodes: DataFrame, edges: DataFrame, rounds: Int = 10,
      broadcastNodeLimit: Long =
        ConnectedComponents.BroadcastNodeLimit): DataFrame = {
    val (edc, pr0, bh, underGate) =
      prepare(nodes, edges, broadcastNodeLimit)
    var pr = pr0
    // the most recent persisted iterate (past-gate regime) — released
    // once the next one has materialized
    var lastCached: Option[DataFrame] = if (underGate) None else Some(pr0)
    var converged = false
    for (i <- 1 to rounds if !converged) {
      val (_, next) = round(edc, pr, bh)
      // materialize every OTHER round: two join+agg rounds of lineage
      // stay re-plannable, and halving the materialization barriers
      // cuts the per-round fixed cost (~2x fewer jobs)
      pr = if (i % 2 == 0 || i == rounds) {
        if (underGate) {
          val ck = next.localCheckpoint()
          converged = ck.filter(col("rank") =!= col("prev_rank")).isEmpty
          ck.select(col("id"), col("rank"))
        } else {
          // persist, not localCheckpoint: the cache keeps the update
          // join's id-partitioning alive into the next round, so the
          // rank iterate is never re-exchanged either
          val ck = next.persist(StorageLevel.MEMORY_AND_DISK)
          converged = ck.filter(col("rank") =!= col("prev_rank")).isEmpty
          lastCached.foreach(_.unpersist())
          lastCached = Some(ck)
          ck.select(col("id"), col("rank"))
        }
      } else next.select(col("id"), col("rank"))
    }
    pr
  }
}
