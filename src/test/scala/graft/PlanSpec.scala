package graft

import org.apache.spark.sql.functions.col

/** Plan-shape assertions (the 100 TB design contract): filters and
  * column pruning reach the parquet scan, small dims broadcast, the
  * sink projection stays inside whole-stage codegen, and partial
  * aggregation precedes every exchange.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("rel_q1_agg: filter pushed to parquet scan + pruned read schema") {
    val p = plan("rel_q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // only the 5 needed columns are read, not all 11
    assert(p.contains("l_returnflag") && !p.contains("l_orderkey"), p)
  }

  test("rel_join_broadcast: dimension join is a BroadcastHashJoin") {
    val p = plan("rel_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("rel_join_shuffle: fact-fact join partial-aggregates before exchange") {
    val p = plan("rel_join_shuffle")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Exchange"), p)
  }

  test("rel_join_shuffle_hash: the hint plans a ShuffledHashJoin build") {
    val p = plan("rel_join_shuffle_hash")
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("sim_knn_brute: probes broadcast, no all-pairs shuffle") {
    val p = plan("sim_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("flagship sink projection runs inside whole-stage codegen") {
    val df = queries.CdcQueries.flagship(spark, sf)
    df.collect() // finalize the adaptive plan (count() would plan separately)
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages are star-prefixed in the plan string; the sink
    // projection (incl. java_string_hash) must be inside one
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).nonEmpty, p)
    assert(p.contains("java_string_hash"), p)
  }

  test("rel_range_join: band predicates ride the equi join, no NLJ") {
    val p = plan("rel_range_join")
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("Join") || p.contains("AdaptiveSparkPlan"), p)
  }

  test("rel_asof_join: single shuffle on user_id (union + one window sort)") {
    val p = plan("rel_asof_join")
    assert(p.contains("Window"), p)
    assert(p.contains("Union"), p)
  }

  test("rel_kmv_groups: rank filter pushes a partial WindowGroupLimit " +
      "below the exchange (map side keeps k per group)") {
    val p = plan("rel_kmv_groups")
    assert(p.contains("WindowGroupLimit"), p)
    // both the Partial (pre-shuffle) and Final instances must plan
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }

  test("dedup_exact: map-side partial aggregation before the shuffle") {
    val p = plan("dedup_exact")
    // two HashAggregates (partial + final) around one Exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("dedup_minhash_sig: per-row fused signature — no aggregate, no shuffle") {
    val p = plan("dedup_minhash_sig")
    // the fused ClampedShingleHashes→MinHashBands pair computes the
    // signature in the scan's projection: the only exchanges allowed
    // are the rebalance repartition and the final ORDER BY
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r
      .findFirstIn(p).isEmpty, p)
    assert(p.contains("minhash_bands") && p.contains("clamped_shingle_hashes"), p)
  }

  test("dedup_ngram_jaccard: inverted-index join, no cartesian product") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("rel_join_skew_salted: replicated build side joins as broadcast") {
    val p = plan("rel_join_skew_salted")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("emb_pq_codes: codebook broadcast, encoding join never shuffles vectors twice") {
    val p = plan("emb_pq_codes")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cdc_dlq: classifier rides the scan — single aggregate, no join") {
    val p = plan("cdc_dlq")
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("rel_band_join_bucketed: theta band join executes as a hash/SMJ " +
      "join on the cell key") {
    val p = plan("rel_band_join_bucketed")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("rel_global_ids: doc windows are lang-partitioned — the only " +
      "single-partition work is the tiny offset table") {
    val p = plan("rel_global_ids")
    // the per-doc rank window must carry a partition spec
    assert(p.contains("row_number()") &&
      p.contains("windowspecdefinition(lang"), p)
    // offsets come back via broadcast, not a shuffled join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("emb_whiten + txt_tokenize_vocab: stats/vocab broadcast back " +
      "onto the scan") {
    assert(plan("emb_whiten").contains("BroadcastHashJoin"))
    val tv = plan("txt_tokenize_vocab")
    assert(tv.contains("BroadcastHashJoin"), tv)
    // top-k vocab selection must be a TakeOrdered, not a global sort
    assert(tv.contains("TakeOrderedAndProject"), tv)
  }

  test("sim_kmeans: per-row argmin against snapshot centroids — " +
      "zero-exchange assignment, no join, no aggregate") {
    val p = plan("sim_kmeans")
    // r17 shape: the final assignment is least(struct(score, cluster))
    // over driver-collected centroid literals — a pure map. No
    // crossJoin (the old BNLJ), no min_by aggregate, no hash(vec_id)
    // exchange; the only exchanges are the rebalance repartition and
    // the ORDER BY range partitioning.
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("min_by"), p)
    assert(p.contains("least("), p)
    val exchanges = "Exchange ".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
  }

  test("pagerank past the broadcast gate: co-partitioned edges+rank " +
      "make each round's join zero-exchange — the edge table is " +
      "never re-exchanged per iteration") {
    import spark.implicits._
    val nodes = (1L to 200L).toDF("id")
    val edges = (1L until 200L).map(i => (i, i + 1))
      .toDF("src", "dst")
    // limit 0 forces the past-gate regime on a tiny graph; the
    // AUTO-broadcast threshold must also be off — at real past-gate
    // scale (> 50 M nodes) the rank table's size estimate disables it
    // by itself, but a 200-row fixture would still auto-broadcast and
    // hide the co-partitioned shape under test
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE off so executedPlan is the concrete tree (an
    // AdaptiveSparkPlanExec is a leaf to collect); the cached-plan
    // partitioning contract itself is AQE-safe — the default
    // canChangeCachedPlanOutputPartitioning=false exists precisely to
    // preserve a cached relation's partitioning under AQE
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (edc, pr0, bh, underGate, _, _) = operators.PageRank.prepare(
        nodes, edges, broadcastNodeLimit = 0L)
      assert(!underGate)
      val (sums, next) = operators.PageRank.round(edc, pr0, bh)
      // tree-collect, not string-matching: the printed plan includes
      // the InMemoryRelation's INTERNAL (one-time) exchange, which is
      // exactly the exchange the per-round path must not repeat
      def shuffles(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => e
        }.size
      def bcasts(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec => e
        }.size
      val pSums = sums.queryExecution.executedPlan.toString
      // the edge⋈rank join consumes the cache-preserved
      // co-partitioning: the ONLY exchange in the contribution sum is
      // the groupBy(dst) shuffle itself — no BroadcastExchange (the
      // gate dropped the hint) and no re-exchange of either join side
      assert(bcasts(sums) == 0, pSums)
      assert(shuffles(sums) == 1, pSums)
      // the edge side is the cached pre-partitioned pre-sorted scan —
      // no Sort above it either (ordering rides the cache)
      assert(pSums.contains("InMemoryTableScan"), pSums)
      // the rank-update join likewise adds NO exchange beyond the
      // contribution sum's: pr(id) and sums(dst) are both pre-hashed
      assert(shuffles(next) == 1,
        next.queryExecution.executedPlan.toString)
      // and the regime is numerically identical to the broadcast path
      val past = operators.PageRank.run(nodes, edges, rounds = 4,
        broadcastNodeLimit = 0L)
      val under = operators.PageRank.run(nodes, edges, rounds = 4)
      assert(past.orderBy(col("id")).collect().toSeq ==
        under.orderBy(col("id")).collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("pagerank under the broadcast gate: the dst-keyed edge cache " +
      "makes each round's contribution sum a zero-exchange stage") {
    import spark.implicits._
    val nodes = (1L to 300L).toDF("id")
    val fwd = (1L until 300L).map(i => (i, i + 1))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE off so executedPlan is the concrete tree; the cached-plan
    // partitioning contract itself is AQE-safe (see the past-gate test)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (edc, pr0, bh, underGate, _, _) = operators.PageRank.prepare(
        nodes, edges, symmetric = true)
      assert(underGate)
      val (sums, _) = operators.PageRank.round(edc, pr0, bh)
      def count(df: org.apache.spark.sql.DataFrame,
          what: String): Int = what match {
        case "shuffle" => df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => e }.size
        case _ => df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec => e }.size
      }
      val pSums = sums.queryExecution.executedPlan.toString
      // ZERO shuffles in a round: the groupBy(dst) rides the
      // cache-preserved hash(dst) partitioning (partial+final agg
      // with no exchange between or below them). The only exchange
      // is ONE node-sized broadcast — the rank vector itself: the
      // src degree is folded into the edge cache at prepare time,
      // so there is no degree-attach join and no second broadcast
      // build anywhere in the round
      assert(count(sums, "shuffle") == 0, pSums)
      assert(count(sums, "broadcast") == 1, pSums)
      assert(pSums.contains("InMemoryTableScan"), pSums)
      edc.unpersist()
    } finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
  }

  test("min-label CC under the broadcast gate: the self-loop-tagged " +
      "dst-keyed cache makes each round a zero-exchange stage") {
    import spark.implicits._
    val vertices = (1L to 200L).toDF("id")
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val edc = operators.ConnectedComponents
        .minLabelEdges(vertices, edges, underGate = true)
      val labels = vertices.select(col("id"), col("id").as("comp"))
        .localCheckpoint()
      val merged = operators.ConnectedComponents.minLabelRound(
        edc, labels, operators.ConnectedComponents.hintIf(true))
      val p = merged.queryExecution.executedPlan
      val shuffles = p.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e }.size
      val bcasts = p.collect {
        case e: org.apache.spark.sql.execution.exchange
          .BroadcastExchangeExec => e }.size
      // the ONLY exchange in a round is the label broadcast: the
      // groupBy(dst) — including the self row carrying the old label —
      // rides the cache-preserved hash(dst) partitioning
      assert(shuffles == 0, p.toString)
      assert(bcasts == 1, p.toString)
      assert(p.toString.contains("InMemoryTableScan"), p.toString)
      edc.unpersist()
    } finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
  }

  test("pagerank symmetric fast path: on a both-directions edge set " +
      "the source-only machinery can be skipped with identical bits") {
    import spark.implicits._
    val nodes = (1L to 60L).toDF("id") // 50..60 isolated
    val fwd = (1L until 50L).map(i => (i, i + 1))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val fast = operators.PageRank.run(nodes, edges, rounds = 5,
      symmetric = true)
    val general = operators.PageRank.run(nodes, edges, rounds = 5)
    assert(fast.orderBy(col("id")).collect().toSeq ==
      general.orderBy(col("id")).collect().toSeq)
    // isolated nodes sit at the damping floor in both
    assert(fast.filter(col("id") === 55L).head().getLong(1) == 150000L)
  }
}
