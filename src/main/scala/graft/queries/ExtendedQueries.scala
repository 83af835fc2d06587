package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.dec2

/** Second wave of relational/analytics coverage: cube & grouping sets,
  * as-of join, banded range join, word count, and exact per-label
  * embedding centroids.
  *
  * The as-of join is deliberately built from existing operators (union +
  * ignore-nulls carry-forward window) rather than a custom SparkPlan —
  * SURVEY §2.2 preference order (a): the composition shuffles once on the
  * partition key and sorts within partitions, which is exactly the
  * physical shape a bespoke as-of operator would produce, with none of
  * the planner surface.
  */
object ExtendedQueries {

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------- cube
    "rel_cube" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // --------------------------------------------------- grouping sets
    "rel_grouping_sets" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        // GROUPING SETS ((l_returnflag), (l_linestatus)) via SQL — the
        // DataFrame API exposes cube/rollup; arbitrary sets go through
        // the SQL front end.
        l.createOrReplaceTempView("graft_lineitem_gs")
        s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          FROM graft_lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // -------------------------------------------------------- as-of join
    // For every 'error' event: the value of the user's most recent
    // 'purchase' at-or-before that time. Union both sides tagged, one
    // shuffle on user_id, ignore-nulls carry-forward within the
    // (user_id, ts, tiebreak) sort — the scalable merge formulation of
    // as-of (no per-row subquery, no range explosion).
    "rel_asof_join" -> QueryDef(
      (s, dir) => {
        val e = Tables.rebalance(Tables.events(s, dir))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("value").as("purchase_value"), lit(0).as("kind"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(null).cast("double").as("purchase_value"), lit(1).as("kind"))
        // kind orders purchase before error at identical ts (inclusive <=)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        purchases.unionAll(errors)
          .withColumn("last_purchase_value",
            last(col("purchase_value"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            col("last_purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH u AS (
          SELECT user_id, ts, event_id, value AS purchase_value, 0 AS kind
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, event_id, NULL AS purchase_value, 1 AS kind
          FROM events WHERE event_type = 'error'),
        c AS (
          SELECT event_id, user_id, ts, kind,
            LAST_VALUE(purchase_value IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY ts, kind, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
          FROM u)
        SELECT event_id, user_id,
          strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
          last_purchase_value
        FROM c WHERE kind = 1 ORDER BY event_id""")),

    // -------------------------------------------- banded range join
    // Lines shipped within 90 days of their order date: equi key plus a
    // range band — the equi component keeps it a hash/SMJ join (no
    // interval explosion); the band is a post-join filter pushed into
    // the join condition.
    "rel_range_join" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey") &&
            l("l_shipdate") >= o("o_orderdate") &&
            l("l_shipdate") <= date_add(o("o_orderdate"), 90))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_shipped_90d"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("value_90d"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_shipped_90d,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value_90d
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // -------------------------------- correlated scalar subquery
    // Catalyst decorrelates this into a join; the per-customer average
    // uses the exact decimal-sum trick inside the subquery.
    "rel_correlated_subquery" -> QueryDef(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_orders_cs")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
          FROM graft_orders_cs o
          WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM graft_orders_cs i WHERE i.o_custkey = o.o_custkey)
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")),

    // ------------------------------------- multiset set operations
    "rel_setops_all" -> QueryDef(
      (s, dir) => {
        val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
        cn.intersectAll(sn).withColumn("tag", lit("intersect_all"))
          .unionAll(cn.exceptAll(sn).withColumn("tag", lit("except_all")))
          .groupBy(col("tag"), col("nationkey"))
          .agg(count(lit(1)).as("multiplicity"))
          .orderBy(col("tag"), col("nationkey"))
      },
      Some("""WITH cn AS (SELECT c_nationkey AS nationkey FROM customer),
        sn AS (SELECT s_nationkey AS nationkey FROM supplier),
        x AS (
          SELECT nationkey, 'intersect_all' AS tag FROM (
            SELECT nationkey FROM cn INTERSECT ALL SELECT nationkey FROM sn)
          UNION ALL
          SELECT nationkey, 'except_all' AS tag FROM (
            SELECT nationkey FROM cn EXCEPT ALL SELECT nationkey FROM sn))
        SELECT tag, nationkey, COUNT(*) AS multiplicity
        FROM x GROUP BY tag, nationkey ORDER BY tag, nationkey""")),

    // ------------------------------------------------------- pivot
    // DataFrame pivot() over order status; the oracle is the manual
    // CASE form (engine-portable pivot semantics).
    "rel_pivot" -> QueryDef(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("o_orderpriority"),
            col("F").as("n_f"), col("O").as("n_o"), col("P").as("n_p"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------ approximate distinct (HLL sketch)
    // HLL register contents are engine-specific, so the raw estimate
    // can never hash-match a DuckDB oracle — instead the query emits
    // the VERDICT (round-4 verdict item 4): the exact distinct counts
    // plus a boolean per column asserting the HLL estimate landed
    // within 5% of exact. Both are deterministic on both sides — Spark's
    // HLL++ is deterministic for a given input, and the oracle only
    // needs the exact counts and TRUE literals — so the row is fully
    // hash-gated. OperatorsSpec separately asserts the 5% band on the
    // raw estimates.
    // The exact and approximate aggregates run in SEPARATE passes
    // joined on the tiny group key: mixing countDistinct (which plans
    // an Expand) with HLL sketches in one agg makes the first-stage
    // partial aggregate allocate an HLL++ buffer per (group, key, gid)
    // row — hundreds of thousands of multi-KB sketches that spill.
    // Split, the distinct pass carries no sketch buffers and the
    // sketch pass partial-aggregates to one buffer per group per
    // partition. Same-session A/B at sf0.1 (r7, 5-rep min through the
    // bench harness): split 0.88 s / 7.9 MB shuffled vs single-pass
    // 4.85 s / 40.0 MB — 5.5x, and the gap widens with scale.
    "rel_approx_distinct" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val exact = l.groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_orderkey")).as("exact_orders"))
        val approx = l.groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        exact.join(approx, "l_returnflag")
          .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
            (abs(col("ap") - col("exact_parts")).cast("double") /
              col("exact_parts").cast("double") <= 0.05)
              .as("parts_within_bound"),
            (abs(col("ao") - col("exact_orders")).cast("double") /
              col("exact_orders").cast("double") <= 0.05)
              .as("orders_within_bound"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        TRUE AS parts_within_bound, TRUE AS orders_within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --------------------- approximate distinct (KMV sketch, oracled)
    // The deterministic companion to the HLL query above: a
    // k-minimum-values sketch whose math is plain ANSI arithmetic, so
    // the SAME estimate is computable in DuckDB and the driver's hash
    // gate covers it (round-3 verdict item 4 — HLL registers are
    // engine-specific, KMV is not). Hash = universal family
    // (a*x + b) mod p with p = 2^61-1, evaluated in decimal(38,0) /
    // HUGEINT so both engines do exact integer math (Spark Long
    // multiplication wraps, DuckDB BIGINT multiplication raises —
    // neither is portable; 128-bit intermediates are). Estimator:
    // D-hat = (k-1) * p / h_(k) — the classic KMV unbiased form, with
    // the final division done in DOUBLE by both engines in the same
    // operation order. At 100 TB the sketch is one distinct-shuffle of
    // 8-byte hashes + a k-row TakeOrdered — no register merge needed,
    // and k=256 keeps the standard error ~1/sqrt(k-1) ≈ 6%.
    "rel_kmv_distinct" -> QueryDef(
      (s, dir) => {
        import graft.operators.Kmv
        val K = 256
        val l = Tables.lineitem(s, dir)
        val h = Kmv.hashCol(col("l_orderkey"), 123456789L)
        val kmv = l.select(h.as("h")).distinct()
          .orderBy(col("h")).limit(K)
          .agg(count(lit(1)).as("k"), max(col("h")).as("kth_hash"))
          .withColumn("est_distinct",
            (col("k") - 1).cast("double") * lit(Kmv.P.toDouble) /
              col("kth_hash").cast("double"))
        val exact = l.agg(
          countDistinct(col("l_orderkey")).as("exact_distinct"))
        kmv.crossJoin(broadcast(exact))
          .select(col("k"), col("kth_hash"), col("est_distinct"),
            col("exact_distinct"))
          .orderBy(col("k"))
      },
      Some("""WITH h AS (
          SELECT DISTINCT CAST(
            (CAST(l_orderkey AS HUGEINT) * 999999999999999989 + 123456789)
              % 2305843009213693951 AS BIGINT) AS h
          FROM lineitem),
        kmin AS (SELECT h FROM h ORDER BY h LIMIT 256),
        kv AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                      CAST(MAX(h) AS BIGINT) AS kth_hash
               FROM kmin),
        ex AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                 AS exact_distinct FROM lineitem)
        SELECT kv.k, kv.kth_hash,
          CAST(kv.k - 1 AS DOUBLE) * CAST(2305843009213693951 AS DOUBLE)
            / CAST(kv.kth_hash AS DOUBLE) AS est_distinct,
          ex.exact_distinct
        FROM kv CROSS JOIN ex ORDER BY kv.k""")),

    // ------------------- grouped KMV distinct sketch (per-group, oracled)
    // The per-GROUP form of rel_kmv_distinct (mirroring what the HLL
    // query estimates per returnflag): k smallest distinct hashes per
    // group via row_number ≤ k. Scale path: Spark's
    // InferWindowGroupLimit turns the rank filter into a PARTIAL
    // WindowGroupLimit below the exchange — every map partition keeps
    // only its own k smallest per group, so the per-group sort after
    // the shuffle sees ≤ k·partitions rows, never the full distinct
    // set (PlanSpec pins the pushdown). Same portable universal hash
    // and (k-1)·p/h_k estimator as the global sketch.
    "rel_kmv_groups" -> QueryDef(
      (s, dir) => {
        import graft.operators.Kmv
        val K = 128
        val l = Tables.lineitem(s, dir)
        val h = Kmv.hashCol(col("l_partkey"), 987654321L)
        val wk = Window.partitionBy(col("l_returnflag")).orderBy(col("h"))
        val kmv = l.select(col("l_returnflag"), h.as("h")).distinct()
          .withColumn("rn", row_number().over(wk))
          .filter(col("rn") <= K)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("k"), max(col("h")).as("kth_hash"))
          .withColumn("est_parts",
            (col("k") - 1).cast("double") * lit(Kmv.P.toDouble) /
              col("kth_hash").cast("double"))
        val exact = l.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_parts"))
        kmv.join(exact, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("k"), col("kth_hash"),
            col("est_parts"), col("exact_parts"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH h AS (
          SELECT DISTINCT l_returnflag, CAST(
            (CAST(l_partkey AS HUGEINT) * 999999999999999989 + 987654321)
              % 2305843009213693951 AS BIGINT) AS h
          FROM lineitem),
        r AS (
          SELECT l_returnflag, h,
            ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
          FROM h),
        kv AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(MAX(h) AS BIGINT) AS kth_hash
          FROM r WHERE rn <= 128 GROUP BY l_returnflag),
        ex AS (
          SELECT l_returnflag,
                 CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
          FROM lineitem GROUP BY l_returnflag)
        SELECT kv.l_returnflag, kv.k, kv.kth_hash,
          CAST(kv.k - 1 AS DOUBLE) * CAST(2305843009213693951 AS DOUBLE)
            / CAST(kv.kth_hash AS DOUBLE) AS est_parts,
          ex.exact_parts
        FROM kv JOIN ex ON kv.l_returnflag = ex.l_returnflag
        ORDER BY kv.l_returnflag""")),

    // ---------------------- bounded top-k via the custom Aggregator
    // Oracle: the aggregator's (score desc, id asc) ordering IS the
    // ROW_NUMBER window formulation — declaring it as the DuckDB oracle
    // proves the k-bounded-buffer plan window-equivalent against an
    // external engine (OperatorsSpec proves it against Spark's own
    // window internally).
    "sim_topk_agg" -> QueryDef(
      (s, dir) => {
        import graft.operators.{ScoredId, TopKAggregator}
        val sess = s
        import sess.implicits._
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .as[(Long, Long, Double)]
          .groupByKey(_._1)
          .mapValues(t => ScoredId(t._2, t._3))
          .agg(new TopKAggregator(3).toColumn)
          .flatMap { case (cust, top) =>
            top.zipWithIndex.map { case (sc, i) => (cust, i + 1, sc.id, sc.score) } }
          .toDF("o_custkey", "rnk", "o_orderkey", "o_totalprice")
          .orderBy(col("o_custkey"), col("rnk"))
      },
      Some("""SELECT o_custkey, CAST(rnk AS INTEGER) AS rnk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM orders)
        WHERE rnk <= 3 ORDER BY o_custkey, rnk""")),

    // --------------------------------------------------------- wordcount
    "txt_wordcount" -> QueryDef(
      (s, dir) => {
        Tables.rebalance(Tables.documents(s, dir))
          .select(explode(split(trim(col("text")), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(20)
      },
      Some("""SELECT word, COUNT(*) AS n FROM (
          SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
        GROUP BY word ORDER BY n DESC, word LIMIT 20""")),

    // ------------------------------------- exact per-label centroids
    // Mean vector per label with ORDER-INDEPENDENT exact math: each
    // double element is cast to decimal(28,14) (exact recovery of the
    // float32-origin value), summed exactly, divided as double at the
    // end. posexplode/lockstep-unnest keeps dimensions aligned.
    "emb_centroid" -> QueryDef(
      (s, dir) => {
        Tables.rebalance(Tables.embeddings(s, dir))
          .select(col("label"), posexplode(col("embedding")))
          .select(col("label"), (col("pos") + 1).as("dim"),
            col("col").cast("double").cast("decimal(28,14)").as("x"))
          .groupBy(col("label"), col("dim"))
          .agg(round(sum(col("x")).cast("double") / count(lit(1)), 6)
            .as("centroid"))
          .filter(col("dim") <= 8)
          .orderBy(col("label"), col("dim"))
      },
      Some("""WITH x AS (
          SELECT label,
            unnest(range(1, len(embedding) + 1)) AS dim,
            unnest(list_transform(embedding,
              e -> CAST(CAST(e AS DOUBLE) AS DECIMAL(28,14)))) AS x
          FROM embeddings)
        SELECT label, dim,
          ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS centroid
        FROM x WHERE dim <= 8
        GROUP BY label, dim ORDER BY label, dim""")),

    // ---------------------------------------------- salted skew join
    // The skew-join survival kit: when one join key holds a grossly
    // disproportionate share of the fact rows, a plain hash join sends
    // that key's entire mass to ONE reducer. Salting splits each fact
    // row's key into (key, salt=hash(row) % S) and EXPLODES the build
    // side S× so every (key, salt) pair still matches — the hot key's
    // rows spread over S reducers at the cost of an S× replicated
    // (small) build side. Result is provably identical to the plain
    // join, which is exactly what the oracle checks. (AQE's runtime
    // skew-join split covers sort-merge cases automatically; explicit
    // salting is the portable form that also works pre-shuffle and in
    // streaming joins.)
    "rel_join_skew_salted" -> QueryDef(
      (s, dir) => {
        val Salt = 8
        // per-type stats = the small build side (5 event types — maximal
        // skew: each key carries ~20% of the fact table)
        val dim = Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("type_n"))
        val dimSalted = dim
          .withColumn("salt",
            explode(array((0 until Salt).map(lit): _*)))
        val fact = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
          .withColumn("salt",
            pmod(xxhash64(col("event_id")), lit(Salt)).cast("int"))
        fact.join(dimSalted, Seq("event_type", "salt"))
          .groupBy(col("event_type"), col("type_n"))
          .agg(count(lit(1)).as("n_joined"),
            sum(dec2(col("value"))).cast("double").as("value_sum"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (
          SELECT event_type, COUNT(*) AS type_n FROM events
          GROUP BY event_type)
        SELECT e.event_type, d.type_n, COUNT(*) AS n_joined,
          CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events e JOIN d ON e.event_type = d.event_type
        GROUP BY e.event_type, d.type_n ORDER BY e.event_type""")),

    // ------------------------ pure band join via interval bucketing
    // Error events within ±5 s of any purchase, with NO shared equi key
    // — the join a naive plan executes as an all-pairs theta join. The
    // scale form: bucket time into 10 s cells (cell width >= band), key
    // purchases by their cell, explode each error to its 3 candidate
    // cells, join on the CELL (hash join), then apply the exact band
    // predicate. Each true pair matches in exactly one candidate cell
    // (a purchase has one cell), so no dedup pass is needed. Work is
    // O(rows × 3) + pairs-in-band — never O(n²); the oracle states the
    // same semantics as the naive theta join.
    "rel_band_join_bucketed" -> QueryDef(
      (s, dir) => {
        val Band = 5L
        val Cell = 10L
        val e = Tables.rebalance(Tables.events(s, dir))
          .withColumn("t", unix_timestamp(col("ts")))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("t").as("tp"),
            expr(s"t div $Cell").as("cell"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("t").as("te"),
            explode(expr(
              s"array(t div $Cell - 1, t div $Cell, t div $Cell + 1)"))
              .as("cell"))
        purchases.join(errors, Seq("cell"))
          .filter(abs(col("tp") - col("te")) <= Band)
          .select(col("purchase_id"), col("error_id"),
            (col("te") - col("tp")).as("dt_s"))
          .orderBy(col("purchase_id"), col("error_id"))
      },
      Some("""WITH e AS (
          SELECT event_id, event_type,
            CAST(floor(epoch(ts)) AS BIGINT) AS t
          FROM events)
        SELECT p.event_id AS purchase_id, x.event_id AS error_id,
          x.t - p.t AS dt_s
        FROM e p JOIN e x
          ON p.event_type = 'purchase' AND x.event_type = 'error'
          AND abs(p.t - x.t) <= 5
        ORDER BY purchase_id, error_id""")),

    // ------------------------- join-key skew census (salting planner)
    // The report that decides WHEN to salt: the 20 hottest join keys
    // and each one's skew multiple (its row count vs the uniform
    // per-key mean). One partial-aggregated count per key, a 1-row
    // corpus-stats broadcast (the BM25 pattern), and a TakeOrdered —
    // no global sort, O(k) output. The integer product cnt × n_keys
    // stays exact; only the final ratio is a double.
    "rel_skew_report" -> QueryDef(
      (s, dir) => {
        val counts = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        val stats = counts.agg(count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("n_rows"))
        counts.crossJoin(broadcast(stats))
          .select(col("l_orderkey"), col("cnt"),
            round((col("cnt") * col("n_keys")).cast("double")
              / col("n_rows").cast("double"), 6).as("skew_x"))
          .orderBy(col("cnt").desc, col("l_orderkey").asc)
          .limit(20)
      },
      Some("""WITH c AS (
          SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem
          GROUP BY l_orderkey),
        s AS (SELECT COUNT(*) AS n_keys,
            CAST(SUM(cnt) AS BIGINT) AS n_rows
          FROM c)
        SELECT c.l_orderkey, c.cnt,
          ROUND(CAST(c.cnt * s.n_keys AS DOUBLE)
            / CAST(s.n_rows AS DOUBLE), 6) AS skew_x
        FROM c CROSS JOIN s
        ORDER BY c.cnt DESC, c.l_orderkey ASC LIMIT 20""")),

    // --------------------- contiguous global ids without a global sort
    // Dense 0-based ids in (lang, doc_id) order, WITHOUT the
    // single-partition window a naive ROW_NUMBER() OVER (ORDER BY ...)
    // plans: ranks are computed per lang (parallel windows), the
    // per-lang offsets come from a running sum over the TINY lang-count
    // table (broadcast back), and the id is offset + local rank. This
    // is the scalable form of zipWithIndex for a 100 TB corpus — the
    // only global pass is over O(groups) rows. The oracle is the naive
    // global ROW_NUMBER, proving the decomposition exact.
    "rel_global_ids" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val offsets = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"))
          .withColumn("offset",
            coalesce(sum(col("n")).over(
              Tables.tinyGlobalWindow(col("lang"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("lang"), col("offset"))
        docs.withColumn("rk", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
          .join(broadcast(offsets), "lang")
          .select(col("doc_id"), col("lang"),
            (col("offset") + col("rk") - 1).as("gid"))
          .orderBy(col("gid"))
      },
      Some("""SELECT doc_id, lang,
          ROW_NUMBER() OVER (ORDER BY lang, doc_id) - 1 AS gid
        FROM documents ORDER BY gid""")),

    // ------------------------------------------- TPC-H Q5-shaped macro join
    // Six-table star join (fact ⋈ 3 mid dims ⋈ 2 broadcast dims) with a
    // selective date filter and an exact-decimal revenue rollup — the
    // canonical join-ordering / broadcast-selection benchmark shape. The
    // region→nation reduction happens FIRST and broadcasts, so supplier
    // is pre-filtered to one region before it ever reaches the fact
    // table; orders is date-pruned at the scan.
    "rel_tpch_q5" -> QueryDef(
      (s, dir) => {
        val r = broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "ASIA"))
        val n = broadcast(Tables.nation(s, dir)
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
        val sup = Tables.supplier(s, dir)
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val l = Tables.lineitem(s, dir).select(col("l_orderkey"),
          col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec2(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ------------------------------------ TPC-H Q10-shaped returns report
    // Revenue lost to returned items per customer over a half-year
    // window: fact ⋈ date-pruned orders ⋈ customer ⋈ broadcast nation,
    // exact-decimal revenue, top-20 via a total-order limit (planned as
    // TakeOrderedAndProject — no global sort materializes).
    "rel_tpch_q10" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        val n = broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name")))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(dec2(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // --------------------------------- TPC-H Q18-shaped large-order scan
    // Orders whose total quantity clears a threshold: a fact-table
    // aggregation with HAVING feeding a join back to orders+customer —
    // the "aggregate then enrich the survivors" shape. Quantities sum
    // as exact decimals; dates canonicalize to epoch seconds.
    "rel_tpch_q18" -> QueryDef(
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(dec2(col("l_quantity"))).as("total_qty_dec"))
          .filter(col("total_qty_dec") > 250)
          .select(col("l_orderkey"),
            col("total_qty_dec").cast("double").as("total_qty"))
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            unix_timestamp(col("o_orderdate")).as("order_sec"),
            col("o_totalprice"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"))
        big.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("order_sec"),
            dec2(col("o_totalprice")).cast("double").as("total_price"),
            col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""WITH big AS (
          SELECT l_orderkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        SELECT c_custkey, c_name, o_orderkey,
          CAST(CAST(epoch(o_orderdate) AS BIGINT) AS BIGINT) AS order_sec,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
          total_qty
        FROM big, orders, customer
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey LIMIT 100""")),

    // ----------------------------------- TPC-H Q3-shaped shipping backlog
    // Unshipped high-value orders for one market segment: two date
    // filters on opposite sides of the cut, three-way join, top-10 by
    // exact-decimal revenue (TakeOrderedAndProject — no global sort).
    "rel_tpch_q3" -> QueryDef(
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1996-06-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            unix_timestamp(col("o_orderdate")).as("order_sec"))
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit("1996-06-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("order_sec"))
          .agg(sum(dec2(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
          CAST(CAST(epoch(o_orderdate) AS BIGINT) AS BIGINT) AS order_sec,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1996-06-01'
          AND l_shipdate > TIMESTAMP '1996-06-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ------------------------------------ bloom-pruned sort-merge join
    // The semi-join runtime filter for the case broadcast can't cover:
    // dim is too big to hash-broadcast, so fact must shuffle for a
    // sort-merge join — but dim's KEY SKETCH fits in ~1 MB. Build a
    // bloom filter over the dim keys (distributed treeAggregate merge
    // of partial sketches), probe it at the fact scan via the native
    // codegen expression, and only survivors pay the exchange. False
    // positives pass the probe but die in the exact join, so the result
    // is bit-identical to the unfiltered join — which is exactly what
    // the oracle checks (plain join SQL, no bloom). ScaleOpsSpec pins
    // the probe sitting below the fact-side exchange and the
    // no-bloom-equivalence property.
    "rel_bloom_join" -> QueryDef(
      (s, dir) => {
        import graft.functions.BloomOps
        val dim = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey"))
        // sketch build: one column-pruned pass over dim, merged on the
        // driver like any broadcast build (~1.2 MB at 1M keys / 1% fp)
        val bloom = dim.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
        val fact = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"))
          .filter(BloomOps.mightContainLong(col("l_orderkey"), bloom))
        fact.join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(dec2(col("l_extendedprice"))).cast("double")
              .as("urgent_revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_revenue,
          COUNT(*) AS n_items
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey AND o_orderpriority = '1-URGENT'
        GROUP BY o_custkey ORDER BY o_custkey""")),

    // ------------------------------------- higher-order array functions
    // The codegen'd array-lambda surface (filter / aggregate / zip_with /
    // reverse) over the embedding vectors — each mirrored by DuckDB's
    // list lambdas; the fold is the same sequential left fold every
    // vector operator in the engine uses, so doubles are bit-identical.
    "rel_array_funcs" -> QueryDef(
      (s, dir) => {
        Tables.embeddings(s, dir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
          .select(col("vec_id"),
            size(expr("filter(v, x -> x > 0)")).cast("long").as("n_pos"),
            round(expr("aggregate(v, 0D, (acc, x) -> acc + x)"), 6)
              .as("v_sum"),
            round(expr(
              "aggregate(zip_with(v, reverse(v), (a, b) -> a * b), 0D, (acc, x) -> acc + x)"),
              6).as("palindrome_dot"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings)
        SELECT vec_id,
          len(list_filter(v, x -> x > 0)) AS n_pos,
          ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), v),
            (acc, x) -> acc + x), 6) AS v_sum,
          ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, len(v) + 1),
              i -> v[CAST(i AS INTEGER)] *
                   v[CAST(len(v) + 1 - i AS INTEGER)])),
            (acc, x) -> acc + x), 6) AS palindrome_dot
        FROM e ORDER BY vec_id""")),

    // ------------------------------------------- math scalar functions
    // The math-function surface over exact-friendly operations only:
    // abs/sign/mod/pmod/floor/ceil/round/trunc/greatest/least are exact
    // integer or decimal ops, sqrt is IEEE-754 correctly-rounded (bit-
    // identical across engines by spec), and squares use x*x (exact
    // float multiply) — pow/exp/ln are deliberately absent because libm
    // gives no cross-engine bit guarantee for them.
    "rel_math_funcs" -> QueryDef(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"),
            abs(col("l_quantity") - lit(25.0)).as("dev"),
            signum(col("l_quantity") - lit(25.0)).cast("int").as("sgn"),
            (col("l_orderkey") % 7).as("m7"),
            pmod(negate(col("l_orderkey")), lit(7L)).as("pm7"),
            floor(col("l_quantity") / 10.0).cast("long").as("flr"),
            ceil(col("l_quantity") / 10.0).cast("long").as("cl"),
            round(col("l_quantity") / 7.0, 2).as("rnd"),
            sqrt(col("l_quantity")).as("rt"),
            (col("l_discount") * col("l_discount")).as("sq"),
            greatest(col("l_quantity"), col("l_extendedprice") / 100.0)
              .as("gr"),
            least(col("l_tax"), col("l_discount")).as("ls"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey,
          ABS(l_quantity - 25.0) AS dev,
          CAST(SIGN(l_quantity - 25.0) AS INTEGER) AS sgn,
          l_orderkey % 7 AS m7,
          ((-l_orderkey % 7) + 7) % 7 AS pm7,
          CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS flr,
          CAST(CEIL(l_quantity / 10.0) AS BIGINT) AS cl,
          ROUND(l_quantity / 7.0, 2) AS rnd,
          SQRT(l_quantity) AS rt,
          l_discount * l_discount AS sq,
          GREATEST(l_quantity, l_extendedprice / 100.0) AS gr,
          LEAST(l_tax, l_discount) AS ls
        FROM lineitem WHERE l_linenumber = 1
        ORDER BY l_orderkey""")),

    // -------------------------------------------- map scalar functions
    // The map-function surface: build a linenumber→quantity map per
    // order (map_from_entries over a sorted entry array — collect_list
    // order is nondeterministic, array_sort fixes it), then probe it
    // with element_at / size / map_keys / transform_values. The oracle
    // computes the same VALUES relationally (DuckDB's map surface
    // differs; the semantics under test are lookup/size/keys/lambda,
    // which project to plain aggregates).
    "rel_map_funcs" -> QueryDef(
      (s, dir) => {
        Tables.lineitem(s, dir)
          // ONE exchange for both keyed aggregations (r18, guide §2.4
          // "two operations keyed the same way can often share one
          // exchange"): hash-partitioning by l_orderkey alone satisfies
          // the (l_orderkey, l_linenumber) clustering of the first
          // aggregate AND the l_orderkey clustering of the second, so
          // the dedup aggregate and the map-building collect_list run
          // back-to-back with no exchange between them — the old shape
          // paid two keyed exchanges carrying the same ~600 k rows.
          .repartition(col("l_orderkey"))
          // map keys must be unique: the fixture reuses linenumbers
          // within an order, so reduce to one entry per key first
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(max(col("l_quantity")).as("q"))
          .groupBy(col("l_orderkey"))
          .agg(map_from_entries(array_sort(collect_list(
            struct(col("l_linenumber"), col("q"))))).as("m"))
          .select(col("l_orderkey"),
            size(col("m")).as("n_lines"),
            element_at(col("m"), 1).as("qty1"),
            concat_ws(",", transform(map_keys(col("m")),
              k => k.cast("string"))).as("keys_csv"),
            element_at(expr("transform_values(m, (k, v) -> v * 2)"), 1)
              .as("qty1_doubled"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH d AS (
          SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS q
          FROM lineitem GROUP BY l_orderkey, l_linenumber)
        SELECT l_orderkey,
          CAST(COUNT(*) AS INTEGER) AS n_lines,
          MAX(CASE WHEN l_linenumber = 1 THEN q END) AS qty1,
          string_agg(CAST(l_linenumber AS VARCHAR), ','
            ORDER BY l_linenumber) AS keys_csv,
          MAX(CASE WHEN l_linenumber = 1 THEN q * 2 END)
            AS qty1_doubled
        FROM d GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ----------------------------------------------- typed JSON parsing
    // from_json with an explicit schema (the typed path — a Jackson
    // parse into a struct inside codegen, vs rel_scalar_json's
    // per-path get_json_object probes).
    "rel_json_parse" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_id"),
            expr("from_json(props, 'k INT').k").as("k_typed"))
          .withColumn("k_bucket", expr("k_typed div 10"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
          CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket
        FROM events ORDER BY event_id""")),

    // --------------------------------------- window navigation functions
    // The remaining window-function family: offset navigation (lag /
    // lead-by-2), positional nth_value under an explicit running frame,
    // and the two rank-ratio functions — exact integer ratios, so the
    // doubles are bit-identical across engines.
    "rel_window_navfuncs" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_orderkey"), col("o_orderstatus"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 2).over(w).as("next2_key"),
          nth_value(col("o_orderkey"), 3).over(wRun).as("third_key"),
          cume_dist().over(w).as("cd"),
          percent_rank().over(w).as("pr"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
          LAG(o_orderkey, 1) OVER w AS prev_key,
          LEAD(o_orderkey, 2) OVER w AS next2_key,
          NTH_VALUE(o_orderkey, 3) OVER (PARTITION BY o_orderstatus
            ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key,
          CUME_DIST() OVER w AS cd,
          PERCENT_RANK() OVER w AS pr
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)
        ORDER BY o_orderkey""")))
}
