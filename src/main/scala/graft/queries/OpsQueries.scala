package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.MisraGries

/** Production-pipeline operations wave: the checks and layout passes a
  * 100 TB ingest runs around the queries themselves.
  *
  *  - `dq_expectations`  — single-pass per-column data-quality profile
  *    (null count, exact distinct, min/max) over a fact table: the
  *    expectation census run before a corpus snapshot is blessed.
  *  - `dq_orphans`       — referential-integrity orphan census across the
  *    star-schema joins (anti-join shape, broadcast where the dim is tiny).
  *  - `lake_zorder`      — Z-order (Morton) layout clustering: min-max
  *    normalize two dimensions to 16 bits each via a broadcast 1-row
  *    bounds row, interleave bits per row (pure projection — no global
  *    sort), bucket by z-prefix into target files, and report per-file
  *    min/max envelopes on BOTH dimensions — the stats that drive
  *    data-skipping after a rewrite.
  *  - `txt_heavy_hitters` — exact heavy hitters via the two-pass sketch
  *    pattern: a Misra–Gries summary (O(k) merged state, map-side
  *    combined) nominates candidates, a second linear pass recounts only
  *    candidates against a broadcast ≤k-element set, and the n/(k+1)
  *    support threshold makes the result provably exact
  *    ([[graft.operators.MisraGries]]).
  */
object OpsQueries {

  /** Heavy-hitter capacity: guarantees exactness for support > n/(K+1). */
  private val HhK = 64

  /** Z-order: bits per dimension after min-max normalization. */
  private val ZBits = 16

  /** Z-order: keep the top bits of the 2*ZBits-bit z-value as the file
    * id — 2^6 = 64 target files.
    */
  private val ZFileBits = 6

  /** Span length (words) for the dup-span miners. */
  private val DupSpanL = 8

  /** Positional L-gram double-hash frame (doc_id, pos, gh1, gh2) —
    * the phase-1/2/3 input shared VERBATIM by `txt_dup_spans` and
    * `txt_dup_spans_prefix`. Behind the session derivation cache
    * ([[DerivationCache]], the LSH-family pattern) the fused codegen
    * gram explode — the family's heaviest stage — is paid once per
    * (session, sfDir); with the cache off each query keeps its own
    * standalone plan.
    */
  private[graft] def dupSpanGrams(s: SparkSession, dir: String): DataFrame = {
    def build = Tables.rebalance(Tables.documents(s, dir))
      // fused codegen positional L-grams (untrimmed tokenization,
      // matching the streaming twin); texts shorter than L tokens
      // yield an empty array, replacing the size filter
      .select(col("doc_id"), posexplode(graft.functions
        .WordGramStrings.wordGramStrings(col("text"), DupSpanL,
          distinct = false)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        xxhash64(col("col")).as("gh1"),
        xxhash64(lit(0x9e3779b9L), col("col")).as("gh2"))
    if (DerivationCache.on(s))
      DerivationCache.memoized(s, dir, "grams8")(build.localCheckpoint())
    else build
  }

  /** Phase-1 dup-hash census over [[dupSpanGrams]]: gh1 values whose
    * gram occurs in more than one document (min≠max doc per hash — a
    * SUPERSET of the true dup grams, false negatives impossible).
    * Identical for both dup-span variants, so it memoizes alongside
    * the gram frame: with the cache on the second variant starts at
    * phase 2.
    */
  private[graft] def dupSpanDupHash(s: SparkSession, dir: String): DataFrame = {
    def build = dupSpanGrams(s, dir)
      .groupBy(col("gh1"))
      .agg(min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
      .filter(col("dmin") =!= col("dmax"))
      .select(col("gh1"))
    if (DerivationCache.on(s))
      DerivationCache.memoized(s, dir, "grams8_dup")(build.localCheckpoint())
    else build
  }

  // ---------------------------------------------------------------- dq
  /** (name, spark min/max → canonical string, duckdb min/max SQL body). */
  private case class ColProfile(
      name: String,
      toStr: Column => Column,
      duckMin: String,
      duckMax: String)

  private val orderCols: Seq[ColProfile] = Seq(
    ColProfile("o_orderkey", _.cast("string"),
      "CAST(MIN(o_orderkey) AS VARCHAR)", "CAST(MAX(o_orderkey) AS VARCHAR)"),
    ColProfile("o_custkey", _.cast("string"),
      "CAST(MIN(o_custkey) AS VARCHAR)", "CAST(MAX(o_custkey) AS VARCHAR)"),
    ColProfile("o_orderstatus", identity,
      "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
    // money double → decimal(18,2) before stringifying: exact 2-decimal
    // rendering in both engines (same rule as every money aggregate)
    ColProfile("o_totalprice", _.cast("decimal(18,2)").cast("string"),
      "CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)",
      "CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)"),
    // timestamps canonicalized to epoch seconds (UTC session both sides)
    ColProfile("o_orderdate", c => unix_timestamp(c).cast("string"),
      "CAST(CAST(epoch(MIN(o_orderdate)) AS BIGINT) AS VARCHAR)",
      "CAST(CAST(epoch(MAX(o_orderdate)) AS BIGINT) AS VARCHAR)"),
    ColProfile("o_orderpriority", identity,
      "MIN(o_orderpriority)", "MAX(o_orderpriority)"))

  // ------------------------------------------------------------ orphans
  private def orphanCensus(
      name: String,
      left: DataFrame, lk: String,
      right: DataFrame, rk: String,
      broadcastDim: Boolean): DataFrame = {
    val rkeys0 = right.select(col(rk))
    val rkeys = if (broadcastDim) broadcast(rkeys0) else rkeys0
    // right keys are PKs (unique) so left_outer preserves left cardinality;
    // one pass yields total and orphan counts together
    left.select(col(lk)).join(rkeys, col(lk) === col(rk), "left_outer")
      .agg(count(lit(1)).as("total_rows"),
        sum(when(col(rk).isNull, 1L).otherwise(0L)).as("orphan_rows"))
      .select(lit(name).as("relation"), col("orphan_rows"), col("total_rows"))
  }

  // ------------------------------------------------------------- zorder
  /** Interleave the low [[ZBits]] bits of x (even positions) and y (odd
    * positions) — plain shift/and/or over longs, fully codegen'd.
    */
  private def interleave(x: Column, y: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** DuckDB mirror of [[interleave]] over columns xn/yn (unrolled sum of
    * disjoint bit terms — identical to the OR of the Spark fold).
    */
  private val interleaveSql: String =
    (0 until ZBits).flatMap { i =>
      Seq(s"(((xn >> $i) & 1) << ${2 * i})", s"(((yn >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  val defs: Map[String, QueryDef] = Map(

    // ---------------------------------------------- data-quality profile
    "dq_expectations" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        // one independent two-phase profile per column, unioned: each
        // branch scans ONLY its column (parquet pruning), pre-aggregates
        // by value (map-side combine ⇒ exchange is O(distinct values)),
        // and folds the value-count table into the 4 stats. This
        // replaces the earlier single multi-countDistinct aggregate,
        // whose Expand multiplied every row by the column count and
        // funneled all columns' distinct sets through one final
        // reducer — the union's branches instead run as parallel
        // column-pruned jobs with no Expand and no shared reducer.
        val branches = orderCols.map { cp =>
          o.select(col(cp.name).as("v"))
            .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
            .agg(
              sum(when(col("v").isNull, col("cnt")).otherwise(0L))
                .as("n_null"),
              count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
              cp.toStr(min(col("v"))).as("min_val"),
              cp.toStr(max(col("v"))).as("max_val"),
              sum(col("cnt")).as("n_rows"))
            .select(lit(cp.name).as("col_name"), col("n_null"),
              col("n_distinct"), col("min_val"), col("max_val"),
              col("n_rows"))
        }
        branches.reduce(_ unionAll _).orderBy(col("col_name"))
      },
      Some(orderCols.map { cp =>
        s"""SELECT '${cp.name}' AS col_name,
           |  COUNT(*) - COUNT(${cp.name}) AS n_null,
           |  COUNT(DISTINCT ${cp.name}) AS n_distinct,
           |  ${cp.duckMin} AS min_val,
           |  ${cp.duckMax} AS max_val,
           |  COUNT(*) AS n_rows
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY col_name")),

    // ------------------------------------------------------ orphan census
    "dq_orphans" -> QueryDef(
      (s, dir) => {
        orphanCensus("lineitem->orders",
          Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey", broadcastDim = false)
          .unionAll(orphanCensus("orders->customer",
            Tables.orders(s, dir), "o_custkey",
            Tables.customer(s, dir), "c_custkey", broadcastDim = false))
          .unionAll(orphanCensus("supplier->nation",
            Tables.supplier(s, dir), "s_nationkey",
            Tables.nation(s, dir), "n_nationkey", broadcastDim = true))
          .orderBy(col("relation"))
      },
      Some("""SELECT * FROM (
        SELECT 'lineitem->orders' AS relation,
          (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
             ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey IS NULL) AS orphan_rows,
          (SELECT COUNT(*) FROM lineitem) AS total_rows
        UNION ALL
        SELECT 'orders->customer',
          (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
             ON c.c_custkey = o.o_custkey WHERE c.c_custkey IS NULL),
          (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'supplier->nation',
          (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n
             ON n.n_nationkey = s.s_nationkey WHERE n.n_nationkey IS NULL),
          (SELECT COUNT(*) FROM supplier)
        ) ORDER BY relation""")),

    // ----------------------------------------------- z-order file layout
    "lake_zorder" -> QueryDef(
      (s, dir) => {
        val base = Tables.orders(s, dir).select(
          col("o_custkey").as("x"),
          expr("unix_timestamp(o_orderdate) div 86400").as("y"))
        val bounds = base.agg(
          min(col("x")).as("xmin"), max(col("x")).as("xmax"),
          min(col("y")).as("ymin"), max(col("y")).as("ymax"))
        def norm(v: Column, lo: Column, hi: Column): Column =
          when(hi === lo, lit(0L))
            .otherwise(((v - lo) * ((1 << ZBits) - 1)).cast("long") / (hi - lo))
            .cast("long")
        val z = base.crossJoin(broadcast(bounds))
          .withColumn("xn", norm(col("x"), col("xmin"), col("xmax")))
          .withColumn("yn", norm(col("y"), col("ymin"), col("ymax")))
          .withColumn("zval", interleave(col("xn"), col("yn")))
          .withColumn("file_id", shiftright(col("zval"), 2 * ZBits - ZFileBits))
        z.groupBy(col("file_id"))
          .agg(count(lit(1)).as("n"),
            min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
            min(col("y")).as("min_day"), max(col("y")).as("max_day"))
          .orderBy(col("file_id"))
      },
      Some(s"""WITH base AS (
          SELECT o_custkey AS x,
                 CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS y
          FROM orders
        ), b AS (
          SELECT MIN(x) AS xmin, MAX(x) AS xmax,
                 MIN(y) AS ymin, MAX(y) AS ymax FROM base
        ), n AS (
          SELECT x, y,
            CASE WHEN xmax = xmin THEN 0
                 ELSE ((x - xmin) * ${(1 << ZBits) - 1}) // (xmax - xmin) END AS xn,
            CASE WHEN ymax = ymin THEN 0
                 ELSE ((y - ymin) * ${(1 << ZBits) - 1}) // (ymax - ymin) END AS yn
          FROM base CROSS JOIN b
        ), z AS (
          SELECT x, y, ($interleaveSql) >> ${2 * ZBits - ZFileBits} AS file_id
          FROM n
        )
        SELECT file_id, COUNT(*) AS n,
          MIN(x) AS min_cust, MAX(x) AS max_cust,
          MIN(y) AS min_day, MAX(y) AS max_day
        FROM z GROUP BY file_id ORDER BY file_id""")),

    // ------------------------------------------------ exact heavy hitters
    "txt_heavy_hitters" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val words = Tables.rebalance(Tables.documents(s, dir))
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 0)
        // pass 1: Misra–Gries sketch → one row (counts: ≤K entries, n)
        val sketch = words.as[String].select(new MisraGries(HhK).toColumn)
        // pass 2: recount ONLY the candidates (broadcast ≤K-key map),
        // then the support threshold makes the answer exact
        words.crossJoin(broadcast(sketch.toDF("counts", "n")))
          .filter(array_contains(map_keys(col("counts")), col("word")))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("cnt"), first(col("n")).as("total_words"))
          .filter(col("cnt") * (HhK + 1) > col("total_words"))
          .select(col("word"), col("cnt"))
          .orderBy(col("cnt").desc, col("word"))
      },
      Some(s"""WITH w AS (
          SELECT w AS word FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE LENGTH(w) > 0
        ), tot AS (SELECT COUNT(*) AS n FROM w)
        SELECT word, COUNT(*) AS cnt
        FROM w GROUP BY word
        HAVING COUNT(*) * ${HhK + 1} > (SELECT n FROM tot)
        ORDER BY cnt DESC, word""")),

    // -------------------------------------------- duplicated-span mining
    // Substring-level exact dedup (the "repeated span" shape of
    // exact-substring training-data dedup): every maximal run of word
    // positions whose L-gram also occurs in ANOTHER document. Inverted
    // index keyed on gram hashes so the 43-char gram strings never
    // enter ANY exchange (round-6 verdict item 4 — they previously
    // shuffled for the verification window). Three phases, all on
    // fixed-width keys:
    //   1. hash-keyed dup detection on the single 8-byte gh1 (the
    //      full-volume aggregate stays on the narrowest possible key):
    //      min/max doc per hash, min!=max flags a SUPERSET of the true
    //      dup grams — false negatives impossible;
    //   2. candidate restriction: position rows (doc_id, pos, gh1,
    //      gh2 — 32 fixed bytes) semi-join the flagged-hash set (AQE
    //      broadcasts it when small, shuffled join on the 8-byte key
    //      at scale);
    //   3. verification over the ~9% candidate subset as a window
    //      keyed on the 128-bit double hash `(gh1, gh2)` — two
    //      INDEPENDENT xxhash64 seeds over the identical gram text —
    //      per-pair min!=max kills phase-1 collisions.
    // Exactness contract (the one the streaming twin already carries):
    // a false span needs a simultaneous collision in BOTH hashes —
    // at a 10^12-gram corpus (the 100 TB scale) the expected 128-bit
    // collision count is (10^12)^2 / 2^129 ≈ 1.5e-15, i.e. none,
    // ever; the DuckDB oracle stays string-exact and gates every
    // fixture run. This replaces the r3-r6 design whose phase-3
    // window partitioned on the gram STRING — the batch/stream twins
    // now share one hash-keyed verification contract, and no exchange
    // anywhere in the plan carries a string.
    "txt_dup_spans" -> QueryDef(
      (s, dir) => {
        val L = DupSpanL
        val grams = dupSpanGrams(s, dir)
        val dupHash = dupSpanDupHash(s, dir)
        val wv = Window.partitionBy(col("gh1"), col("gh2"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        grams.join(dupHash, Seq("gh1"), "left_semi")
          .withColumn("vmin", min(col("doc_id")).over(wv))
          .withColumn("vmax", max(col("doc_id")).over(wv))
          .filter(col("vmin") =!= col("vmax"))
          .select(col("doc_id"), col("pos"))
          .withColumn("isl", col("pos") - row_number().over(w))
          .groupBy(col("doc_id"), col("isl"))
          .agg(min(col("pos")).as("span_start"),
            (max(col("pos")) - min(col("pos")) + L).as("span_words"))
          .select(col("doc_id"), col("span_start"), col("span_words"))
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some("""WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 8
        ), g AS (
          SELECT doc_id, i AS pos,
            array_to_string(list_slice(toks,
              CAST(i AS INTEGER) + 1, CAST(i AS INTEGER) + 8), ' ') AS gram
          FROM d, UNNEST(range(0, len(toks) - 7)) AS t(i)
        ), dupg AS (
          SELECT gram FROM g GROUP BY gram HAVING MIN(doc_id) <> MAX(doc_id)
        ), dp AS (
          SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dupg)
        ), isl AS (
          SELECT doc_id, pos,
            pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
          FROM dp
        )
        SELECT doc_id, MIN(pos) AS span_start,
          MAX(pos) - MIN(pos) + 8 AS span_words
        FROM isl GROUP BY doc_id, isl
        ORDER BY doc_id, span_start""")),

    // ------------------------------------ dup spans vs the corpus-so-far
    // PREFIX semantics: a span in doc d is flagged iff the same 8-gram
    // occurs in some EARLIER doc (doc_id < d) — "what does this newly
    // ingested doc duplicate from the corpus before it", the as-of-
    // ingest view a training pipeline wants when appending to a
    // standing corpus (the symmetric corpus-wide view is
    // txt_dup_spans). Same three-phase hash-keyed design (see
    // txt_dup_spans for the exactness contract): the phase-3 window
    // computes each 128-bit pair's first-seen doc and
    // `doc_id > vmin` keeps exactly the later-doc occurrences —
    // phase-1's min!=max prefilter is a pure optimization here, since
    // doc_id > vmin is unsatisfiable when a gram lives in one doc.
    // Gram strings never shuffle. [[streaming.StreamingDupSpans]]
    // computes the BIT-identical answer incrementally per micro-batch
    // — batch and stream share one verification contract.
    "txt_dup_spans_prefix" -> QueryDef(
      (s, dir) => {
        val L = DupSpanL
        val grams = dupSpanGrams(s, dir)
        val dupHash = dupSpanDupHash(s, dir)
        val wv = Window.partitionBy(col("gh1"), col("gh2"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        grams.join(dupHash, Seq("gh1"), "left_semi")
          .withColumn("vmin", min(col("doc_id")).over(wv))
          .filter(col("doc_id") > col("vmin"))
          .select(col("doc_id"), col("pos"))
          .withColumn("isl", col("pos") - row_number().over(w))
          .groupBy(col("doc_id"), col("isl"))
          .agg(min(col("pos")).as("span_start"),
            (max(col("pos")) - min(col("pos")) + L).as("span_words"))
          .select(col("doc_id"), col("span_start"), col("span_words"))
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some("""WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 8
        ), g AS (
          SELECT doc_id, i AS pos,
            array_to_string(list_slice(toks,
              CAST(i AS INTEGER) + 1, CAST(i AS INTEGER) + 8), ' ') AS gram
          FROM d, UNNEST(range(0, len(toks) - 7)) AS t(i)
        ), fg AS (
          SELECT gram, MIN(doc_id) AS dmin FROM g GROUP BY gram
        ), dp AS (
          SELECT g.doc_id, g.pos FROM g JOIN fg ON g.gram = fg.gram
          WHERE g.doc_id > fg.dmin
        ), isl AS (
          SELECT doc_id, pos,
            pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
          FROM dp
        )
        SELECT doc_id, MIN(pos) AS span_start,
          MAX(pos) - MIN(pos) + 8 AS span_words
        FROM isl GROUP BY doc_id, isl
        ORDER BY doc_id, span_start""")),

    // ------------------------------------------- data-skipping A/B report
    // Quantifies what lake_zorder buys: per-file (min,max) envelopes on
    // BOTH dimensions under (a) the natural date-bucketed layout and
    // (b) the z-order layout, probed with 16 deterministic 2-D range
    // queries (custkey-range × day-range, each 1/8 of the domain,
    // diagonally spread). Reports files whose envelope intersects each
    // probe — the exact min/max pruning a lake format performs. All
    // stages after the two per-file aggregations are ≤64-row
    // broadcasts; integer math throughout.
    "lake_skip_report" -> QueryDef(
      (s, dir) => {
        val base = Tables.orders(s, dir).select(
          col("o_custkey").as("x"),
          expr("unix_timestamp(o_orderdate) div 86400").as("y"))
        val bounds = base.agg(
          min(col("x")).as("xmin"), max(col("x")).as("xmax"),
          min(col("y")).as("ymin"), max(col("y")).as("ymax"))
        def norm(v: Column, lo: Column, hi: Column): Column =
          when(hi === lo, lit(0L))
            .otherwise(((v - lo) * ((1 << ZBits) - 1)).cast("long") / (hi - lo))
            .cast("long")
        val withBounds = base.crossJoin(broadcast(bounds))
        val envNat = withBounds
          .withColumn("file_id",
            when(col("ymax") === col("ymin"), lit(0L))
              .otherwise(((col("y") - col("ymin")) * 63).cast("long") /
                (col("ymax") - col("ymin")))
              .cast("long"))
          .groupBy(col("file_id"))
          .agg(min(col("x")).as("fxmin"), max(col("x")).as("fxmax"),
            min(col("y")).as("fymin"), max(col("y")).as("fymax"))
        val envZ = withBounds
          .withColumn("xn", norm(col("x"), col("xmin"), col("xmax")))
          .withColumn("yn", norm(col("y"), col("ymin"), col("ymax")))
          .withColumn("file_id",
            shiftright(interleave(col("xn"), col("yn")), 2 * ZBits - ZFileBits))
          .groupBy(col("file_id"))
          .agg(min(col("x")).as("fxmin"), max(col("x")).as("fxmax"),
            min(col("y")).as("fymin"), max(col("y")).as("fymax"))
        val probes = s.range(16).toDF("probe_id")
          .crossJoin(broadcast(bounds))
          .select(col("probe_id"),
            (col("xmin") + ((col("xmax") - col("xmin")) *
              ((col("probe_id") * 5) % 16)).cast("long") / 16).cast("long").as("cust_lo"),
            ((col("xmax") - col("xmin")).cast("long") / 8).cast("long").as("cw"),
            (col("ymin") + ((col("ymax") - col("ymin")) *
              ((col("probe_id") * 7) % 16)).cast("long") / 16).cast("long").as("day_lo"),
            ((col("ymax") - col("ymin")).cast("long") / 8).cast("long").as("dw"))
          .select(col("probe_id"), col("cust_lo"),
            (col("cust_lo") + col("cw")).as("cust_hi"),
            col("day_lo"), (col("day_lo") + col("dw")).as("day_hi"))
        def hits(env: DataFrame, out: String): DataFrame =
          probes.join(broadcast(env),
            col("fxmax") >= col("cust_lo") && col("fxmin") <= col("cust_hi") &&
              col("fymax") >= col("day_lo") && col("fymin") <= col("day_hi"),
            "left_outer")
            .groupBy(col("probe_id"))
            .agg(count(col("file_id")).as(out))
        hits(envNat, "nat_files")
          .join(hits(envZ, "z_files"), Seq("probe_id"))
          .orderBy(col("probe_id"))
      },
      Some(s"""WITH base AS (
          SELECT o_custkey AS x,
                 CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS y
          FROM orders
        ), b AS (
          SELECT MIN(x) AS xmin, MAX(x) AS xmax,
                 MIN(y) AS ymin, MAX(y) AS ymax FROM base
        ), env_nat AS (
          SELECT CASE WHEN ymax = ymin THEN 0
                   ELSE ((y - ymin) * 63) // (ymax - ymin) END AS file_id,
            MIN(x) AS fxmin, MAX(x) AS fxmax,
            MIN(y) AS fymin, MAX(y) AS fymax
          FROM base CROSS JOIN b GROUP BY 1
        ), n AS (
          SELECT x, y,
            CASE WHEN xmax = xmin THEN 0
                 ELSE ((x - xmin) * ${(1 << ZBits) - 1}) // (xmax - xmin) END AS xn,
            CASE WHEN ymax = ymin THEN 0
                 ELSE ((y - ymin) * ${(1 << ZBits) - 1}) // (ymax - ymin) END AS yn
          FROM base CROSS JOIN b
        ), env_z AS (
          SELECT ($interleaveSql) >> ${2 * ZBits - ZFileBits} AS file_id,
            MIN(x) AS fxmin, MAX(x) AS fxmax,
            MIN(y) AS fymin, MAX(y) AS fymax
          FROM n GROUP BY 1
        ), probes AS (
          SELECT i AS probe_id,
            xmin + ((xmax - xmin) * ((i * 5) % 16)) // 16 AS cust_lo,
            xmin + ((xmax - xmin) * ((i * 5) % 16)) // 16
              + (xmax - xmin) // 8 AS cust_hi,
            ymin + ((ymax - ymin) * ((i * 7) % 16)) // 16 AS day_lo,
            ymin + ((ymax - ymin) * ((i * 7) % 16)) // 16
              + (ymax - ymin) // 8 AS day_hi
          FROM range(0, 16) AS t(i) CROSS JOIN b
        ), nat_hits AS (
          SELECT p.probe_id, COUNT(e.file_id) AS nat_files
          FROM probes p LEFT JOIN env_nat e
            ON e.fxmax >= p.cust_lo AND e.fxmin <= p.cust_hi
           AND e.fymax >= p.day_lo AND e.fymin <= p.day_hi
          GROUP BY p.probe_id
        ), z_hits AS (
          SELECT p.probe_id, COUNT(e.file_id) AS z_files
          FROM probes p LEFT JOIN env_z e
            ON e.fxmax >= p.cust_lo AND e.fxmin <= p.cust_hi
           AND e.fymax >= p.day_lo AND e.fymin <= p.day_hi
          GROUP BY p.probe_id
        )
        SELECT nh.probe_id, nh.nat_files, zh.z_files
        FROM nat_hits nh JOIN z_hits zh ON nh.probe_id = zh.probe_id
        ORDER BY nh.probe_id""")),

    // ------------------------------------------------- BPE pair counting
    // The inner aggregation of byte-pair-encoding vocabulary induction:
    // adjacent symbol-pair counts over the corpus, weighted by word
    // frequency — two keyed aggregations (word counts collapse the
    // corpus to its vocabulary FIRST, so the pair explosion runs over
    // distinct words, not every token occurrence). Top-20 merge
    // candidates; the iterative trainer around this aggregation is
    // [[graft.operators.BpeTrainer]].
    "txt_bpe_pairs" -> QueryDef(
      (s, dir) => {
        val words = Tables.rebalance(Tables.documents(s, dir))
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        words
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
            .as("pair"))
          .groupBy(col("pair"))
          .agg(sum(col("cnt")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(20)
      },
      Some("""WITH words AS (
          SELECT w, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          WHERE LENGTH(w) >= 2 GROUP BY w
        ), pairs AS (
          SELECT SUBSTR(w, CAST(i AS INTEGER), 2) AS pair, cnt
          FROM words, UNNEST(range(1, LENGTH(w))) AS t(i)
        )
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair
        ORDER BY cnt DESC, pair LIMIT 20"""))
  )
}
