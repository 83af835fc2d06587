package graft.queries

import org.apache.spark.sql.functions._

/** Composed training-data-pipeline queries: per-language corpus stats
  * (incl. exact-parity median), a keep/drop quality filter combining the
  * text-analysis signals, and the LSH-bucketed embedding near-dup (the
  * scale variant of dedup_embedding — candidate pairs only within a
  * sign-bit bucket).
  */
object PipelineQueries {

  /** SQL-literal stopword list, shared with the composed curation
    * pipeline in [[CurationQueries]].
    */
  private[queries] val stopList = Seq(
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    .map(w => s"'$w'").mkString(", ")

  val defs: Map[String, QueryDef] = Map(

    // -------------------------------------- per-language corpus stats
    // median over integer token counts: both engines interpolate the two
    // middle ints as a + (b-a)*0.5 — exact, order-independent.
    "txt_lang_stats" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("n_tokens", size(split(trim(col("text")), " ")))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            min(col("n_tokens")).as("min_tokens"),
            max(col("n_tokens")).as("max_tokens"),
            median(col("n_tokens")).as("median_tokens"),
            sum(col("n_tokens").cast("long")).as("total_tokens"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
        CAST(MIN(len(string_split(trim(text), ' '))) AS INTEGER) AS min_tokens,
        CAST(MAX(len(string_split(trim(text), ' '))) AS INTEGER) AS max_tokens,
        median(len(string_split(trim(text), ' '))) AS median_tokens,
        CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens
        FROM documents GROUP BY lang ORDER BY lang""")),

    // ---------------------------------------- keep/drop quality filter
    "docs_quality_filter" -> QueryDef(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("stop_cnt",
            expr(s"size(filter(toks, t -> t IN ($stopList)))"))
        d.select(
          col("doc_id"),
          (col("n_tokens") >= 5 && col("n_tokens") <= 2000).as("len_ok"),
          (col("stop_cnt") > 0).as("has_stopwords"),
          (length(col("text")) >= 50).as("chars_ok"))
          .withColumn("keep",
            col("len_ok") && col("has_stopwords") && col("chars_ok"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (
        SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
        m AS (SELECT doc_id, text,
          len(toks) AS n_tokens,
          len(list_filter(toks, t -> t IN ($stopList))) AS stop_cnt
        FROM d)
        SELECT doc_id,
          n_tokens >= 5 AND n_tokens <= 2000 AS len_ok,
          stop_cnt > 0 AS has_stopwords,
          LENGTH(text) >= 50 AS chars_ok,
          (n_tokens >= 5 AND n_tokens <= 2000) AND stop_cnt > 0
            AND LENGTH(text) >= 50 AS keep
        FROM m ORDER BY doc_id""")),

    // --------------------- corpus cross-entropy quality scoring
    // Unigram LM fit on the corpus itself; each doc scored by its mean
    // negative log-likelihood (high ⇒ rare-token-heavy ⇒ candidate
    // outlier). Two stages: tiny model (distinct tokens) broadcast back
    // onto the token stream — no quadratic stage. The normalizer (total
    // token count) is a 1-row aggregate crossJoined as a broadcast onto
    // the model (the BM25 corpus-stats pattern): an unpartitioned window
    // over the model would serialize the whole vocabulary through one
    // partition — a straggler once the corpus vocabulary is web-scale.
    // Per-token -ln(p) is cast to
    // decimal(28,15) so the per-doc sum is order-independent; the final
    // mean is rounded to 6dp (cross-engine ln agrees to well below
    // that).
    "txt_cross_entropy" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        val toks: DataFrame = Tables.rebalance(Tables.documents(s, dir))
          .select(col("doc_id"),
            explode(split(trim(col("text")), " ")).as("w"))
        // the normalizer FOLDS OUT OF the vocabulary counts (each
        // token instance lands in exactly one w group, so summing cnt
        // equals counting instances): the 1-row total aggregates
        // |vocab| model rows, its exchange is shared with the model's
        // own aggregation, and the corpus explode is evaluated twice
        // per run (model + scoring join), not three times
        val cnts = toks.groupBy(col("w"))
          .agg(count(lit(1)).as("cnt"))
        val total = cnts.agg(sum(col("cnt")).cast("long").as("total"))
        val model = cnts
          .crossJoin(broadcast(total))
          .withColumn("lp",
            (-log(col("cnt").cast("double") / col("total").cast("double")))
              .cast("decimal(28,15)"))
          .select(col("w"), col("lp"))
        toks.join(broadcast(model), "w")
          .groupBy(col("doc_id"))
          .agg(
            round(sum(col("lp")).cast("double") / count(lit(1)), 6)
              .as("cross_entropy"),
            count(lit(1)).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents),
        tot AS (SELECT COUNT(*) AS total FROM t),
        m AS (
          SELECT w, CAST(-ln(CAST(COUNT(*) AS DOUBLE) /
            CAST((SELECT total FROM tot) AS DOUBLE)) AS DECIMAL(28,15)) AS lp
          FROM t GROUP BY w)
        SELECT doc_id,
          ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS cross_entropy,
          COUNT(*) AS n_tokens
        FROM t JOIN m USING (w)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------ token scrubbing
    // Filter-and-rejoin cleansing (stopword removal here; a PII/URL
    // blocklist is the same operator with a different list) — pure
    // array ops so Spark and DuckDB agree exactly, no regex dialects.
    "txt_scrub" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .select(
            col("doc_id"),
            expr(s"array_join(filter(toks, t -> NOT t IN ($stopList)), ' ')")
              .as("scrubbed"),
            (size(col("toks")) -
              expr(s"size(filter(toks, t -> NOT t IN ($stopList)))"))
              .as("n_removed"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (
        SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
        SELECT doc_id,
          array_to_string(list_filter(toks, t -> NOT t IN ($stopList)), ' ') AS scrubbed,
          CAST(len(toks) - len(list_filter(toks, t -> NOT t IN ($stopList))) AS INTEGER) AS n_removed
        FROM d ORDER BY doc_id""")),

    // ------------------------------------- batch sessionization
    // The batch twin of session_window: per-user 30-minute-gap sessions
    // via lag + running sum — one shuffle on user_id, no state store.
    "evt_sessionize" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, dir)
          .withColumn("sec", unix_timestamp(col("ts")))
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("prev_sec", lag(col("sec"), 1).over(wOrd))
          .withColumn("new_session",
            when(col("prev_sec").isNull ||
              col("sec") - col("prev_sec") > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("sec")).as("start_sec"),
            max(col("sec")).as("end_sec"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH e AS (
          SELECT user_id, event_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS sec
          FROM events),
        g AS (
          SELECT user_id, event_id, sec,
            CASE WHEN LAG(sec, 1) OVER w IS NULL
                   OR sec - LAG(sec, 1) OVER w > 1800
                 THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        sid AS (
          SELECT user_id, sec,
            CAST(SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY sec, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM g)
        SELECT user_id, session_id, COUNT(*) AS n_events,
          MIN(sec) AS start_sec, MAX(sec) AS end_sec
        FROM sid GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // ---------------------- LSH-bucketed embedding near-dup (scale path)
    "dedup_embedding_lsh" -> QueryDef(
      (s, dir) => {
        val e = Tables.rebalance(Tables.embeddings(s, dir)).select(
          col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
          .withColumn("norm", graft.functions.VectorOps.l2Norm(col("v")))
          .withColumn("bucket",
            (0 until 4).map(i =>
              when(expr(s"element_at(v, ${i + 1})") > 0, lit(1L << i))
                .otherwise(lit(0L))).reduce(_ + _))
        val a = e.as("a")
        val b = e.as("b")
        a.join(b, col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            (graft.functions.VectorOps.arrayDot(col("a.v"), col("b.v")) /
              (col("a.norm") * col("b.norm"))).as("cos_sim"))
          .filter(col("cos_sim") >= 0.2)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some {
        val bucketSql = (0 until 4)
          .map(i => s"(CASE WHEN v[${i + 1}] > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
          .mkString(" + ")
        """WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        n AS (SELECT vec_id, v,
          sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(v, x -> x * x)), (acc, x) -> acc + x)) AS norm,
          BUCKET_EXPR AS bucket
        FROM e)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, 65),
              i -> a.v[CAST(i AS INTEGER)] * b.v[CAST(i AS INTEGER)])),
            (acc, x) -> acc + x) / (a.norm * b.norm) AS cos_sim
        FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, 65),
              i -> a.v[CAST(i AS INTEGER)] * b.v[CAST(i AS INTEGER)])),
            (acc, x) -> acc + x) / (a.norm * b.norm) >= 0.2
        ORDER BY vec_a, vec_b""".replace("BUCKET_EXPR", bucketSql)
      }))
}
