package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.dec2

/** The relational operator surface (SURVEY §2.2): the reference has no
  * SQL front end, so these queries declare the full built-in capability
  * set the rebuild provides — aggregation, broadcast + shuffle joins,
  * window functions, sorts/top-k, set ops, distinct aggregation,
  * rollup/cube, semi/anti joins, and scalar string/date/JSON functions —
  * each hash-checked against a DuckDB oracle.
  *
  * Scale design notes (100 TB):
  *   - filters/projections sit directly on the parquet scan (pushdown +
  *     column pruning verified via explain in PlanSpec)
  *   - small dims (nation/region/supplier/part at any SF) are explicitly
  *     `broadcast()` — no shuffle on the fact side
  *   - big-big joins (lineitem ⋈ orders) shuffle on the join key once;
  *     aggregations are partial (map-side combine) before the exchange
  *   - every query ends in a deterministic ORDER BY so results are
  *     reproducible regardless of partitioning/AQE decisions.
  */
object RelationalQueries {

  val defs: Map[String, QueryDef] = Map(

    // ---------------------------------------------------------------- agg
    "rel_q1_agg" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec2(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"),
            (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
              .as("avg_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------- broadcast dim join
    "rel_join_broadcast" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).cast("double").as("total_spent"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // --------------------------------------------------- big-big shuffle join
    "rel_join_shuffle" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_lines"),
            sum(dec2(col("l_extendedprice")) *
              (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
              .cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
        COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------- shuffled hash join strategy
    // The third join strategy: both sides shuffle on the key but the
    // build side hashes instead of sorting — the right pick when one
    // side is much smaller than the other yet over the broadcast
    // threshold (skips both sides' sorts; needs build-side-fits-memory
    // per partition). Same oracle semantics as a plain join; the hint
    // pins the physical strategy and PlanSpec asserts it planned.
    "rel_join_shuffle_hash" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val c = Tables.customer(s, dir).hint("shuffle_hash")
        val o = Tables.orders(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_lines"),
            sum(dec2(col("l_quantity"))).cast("double").as("qty"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
        COUNT(*) AS n_lines,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ------------------------------------------------------- window funcs
    "rel_window" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        o.select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("rn"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
        ROW_NUMBER() OVER w AS rn,
        LAG(o_totalprice, 1) OVER w AS prev_price,
        LEAD(o_totalprice, 1) OVER w AS next_price,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_orderkey""")),

    // ------------------------------------------------------- sort / top-k
    "rel_topk" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_custkey"))
          .agg(
            sum(dec2(col("o_totalprice"))).cast("double").as("total_spent"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("total_spent").desc, col("o_custkey").asc)
          .limit(10)
      },
      Some("""SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
        ORDER BY total_spent DESC, o_custkey ASC LIMIT 10""")),

    // ------------------------------------------------------------ set ops
    "rel_setops" -> QueryDef(
      (s, dir) => {
        val cn = Tables.customer(s, dir)
          .select(col("c_nationkey").as("nationkey")).distinct()
        val sn = Tables.supplier(s, dir)
          .select(col("s_nationkey").as("nationkey")).distinct()
        cn.intersect(sn).withColumn("tag", lit("both"))
          .unionAll(cn.except(sn).withColumn("tag", lit("cust_only")))
          .unionAll(sn.except(cn).withColumn("tag", lit("supp_only")))
          .orderBy(col("tag"), col("nationkey"))
      },
      Some("""WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        UNION ALL SELECT nationkey, 'cust_only' AS tag FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        UNION ALL SELECT nationkey, 'supp_only' AS tag FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
        ORDER BY tag, nationkey""")),

    // -------------------------------------------- distinct aggregation
    "rel_distinct" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey")).as("n_custs"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
        COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ----------------------------------------------------- rollup / cube
    "rel_rollup" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ------------------------------------------------- semi / anti joins
    "rel_semi_anti" -> QueryDef(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("has_orders").as("tag"))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("no_orders").as("tag"))
        semi.unionAll(anti).orderBy(col("tag"), col("c_custkey"))
      },
      Some("""SELECT c_custkey, 'has_orders' AS tag FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, 'no_orders' AS tag FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY tag, c_custkey""")),

    // ------------------------------------- scalar string/date/JSON funcs
    "rel_scalar_json" -> QueryDef(
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.select(
          col("event_id"),
          upper(col("event_type")).as("etype_upper"),
          substring(col("event_type"), 1, 3).as("etype3"),
          concat_ws("-", col("event_type"), col("user_id").cast("string")).as("ekey"),
          get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          year(col("ts")).as("yr"),
          month(col("ts")).as("mth"),
          dayofmonth(col("ts")).as("dom"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
        UPPER(event_type) AS etype_upper,
        SUBSTR(event_type, 1, 3) AS etype3,
        event_type || '-' || CAST(user_id AS VARCHAR) AS ekey,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
        strftime(ts, '%Y-%m-%d') AS day,
        CAST(EXTRACT(year FROM ts) AS INTEGER) AS yr,
        CAST(EXTRACT(month FROM ts) AS INTEGER) AS mth,
        CAST(EXTRACT(day FROM ts) AS INTEGER) AS dom
        FROM events ORDER BY event_id""")),

    // --------------------------------------------------- outer joins
    "rel_outer_joins" -> QueryDef(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(QueryDef.dec2(col("o_totalprice"))).cast("double"),
              lit(0.0)).as("total_spent"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
        COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // ----------------------------------- batch time-window aggregation
    // The window() generator in batch mode (identical code runs under
    // readStream — StreamingSpec drives the streaming side).
    "rel_time_window" -> QueryDef(
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(window(col("ts"), "1 day"))
          .agg(
            count(lit(1)).as("n"),
            sum(QueryDef.dec2(col("value"))).cast("double").as("total_value"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd").as("day_start"),
            col("n"), col("total_value"))
          .orderBy(col("day_start"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_start,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1 ORDER BY day_start""")),

    // ----------------------------------------- string function breadth
    "rel_string_funcs" -> QueryDef(
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.select(
          col("event_id"),
          levenshtein(col("event_type"), lit("purchase")).as("lev_purchase"),
          initcap(col("event_type")).as("etype_cap"),
          reverse(col("event_type")).as("etype_rev"),
          lpad(col("event_type"), 10, "_").as("etype_pad"),
          repeat(substring(col("event_type"), 1, 2), 2).as("etype_rep"),
          instr(col("event_type"), "e").as("e_pos"),
          translate(col("event_type"), "aeiou", "AEIOU").as("etype_tr"),
          length(col("event_type")).as("etype_len"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
        CAST(levenshtein(event_type, 'purchase') AS INTEGER) AS lev_purchase,
        CASE WHEN LENGTH(event_type) > 0
          THEN UPPER(SUBSTR(event_type, 1, 1)) || SUBSTR(event_type, 2)
          ELSE event_type END AS etype_cap,
        reverse(event_type) AS etype_rev,
        lpad(event_type, 10, '_') AS etype_pad,
        repeat(SUBSTR(event_type, 1, 2), 2) AS etype_rep,
        CAST(strpos(event_type, 'e') AS INTEGER) AS e_pos,
        translate(event_type, 'aeiou', 'AEIOU') AS etype_tr,
        CAST(LENGTH(event_type) AS INTEGER) AS etype_len
        FROM events ORDER BY event_id""")),

    // ------------------------------------------- date function breadth
    // Project-AFTER-sort (r18, guide §2.3/§2.6 "project before the
    // exchange"): the derived strings (month_end/plus_q) are computed
    // ABOVE the global sort, so the range exchange carries four fixed
    // 8-byte columns (~40 B/row) instead of the 6-column string-bearing
    // output (~88 B/row), and the RangePartitioner's sampling pass
    // recomputes only the narrow join projection, not the date_format
    // chain. Order safety: the fixture's (l_orderkey, l_linenumber) is
    // NOT duplicate-free (118 k tie groups at sf0.1 carry >1 distinct
    // l_shipdate — audited in OPTIMIZATION_r18.md), so the sort gains
    // the deterministic l_shipdate tiebreaker IN BOTH ENGINES (the r17
    // verdict's sanctioned fix): within (l_orderkey, l_linenumber,
    // l_shipdate) every output column is functionally determined
    // (o_orderdate is unique per l_orderkey), so returned order is now
    // provably total instead of resting on both engines' sorts
    // happening to be stable over identical scan order.
    "rel_date_funcs" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate"), col("o_orderdate"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            datediff(col("l_shipdate"), col("o_orderdate")).as("ship_lag_days"),
            quarter(col("o_orderdate")).as("order_quarter"),
            date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
            date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus_q"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS ship_lag_days,
        CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_q
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ORDER BY l_orderkey, l_linenumber, l_shipdate""")),

    // ------------------------------------ exact stats via decimal sums
    "rel_stats" -> QueryDef(
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.groupBy(col("l_returnflag"))
          .agg(
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("n"),
            (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1)))
              .as("avg_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        MIN(l_extendedprice) AS min_price,
        MAX(l_extendedprice) AS max_price,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")))
}
