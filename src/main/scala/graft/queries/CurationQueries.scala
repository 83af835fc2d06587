package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.{uhash, uhashSql}

/** Data-curation operators a 100 TB training-data pipeline needs beyond
  * dedup/similarity: repetition-ratio quality signals, DETERMINISTIC
  * hash sampling (reproducible across runs/retries — `rand()` sampling
  * is not, and breaks task-retry exactly-once), domain-mix rebalancing
  * to uniform source weights, GPT-style concat-and-chunk sequence
  * packing, and exact grouped percentiles.
  *
  * Scale notes: the sampling and repetition operators are scan→project
  * (shuffle-free, linear); domain mixing shuffles only the TINY
  * per-source count table (broadcast back); packing windows are
  * partitioned per language so the running-offset sort never needs a
  * global single-partition pass.
  */
object CurationQueries {

  /** Context length for sequence packing (tokens per training row). */
  val PackCtxLen = 512

  /** Docs kept per language by the stratified sampler. */
  val StratifiedPerGroup = 50

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------- repetition quality signals
    // Gopher-style repetition ratios: duplicate word-bigram and
    // duplicate-token fractions per document — pure array ops, no
    // shuffle, exact in both engines (small-integer division).
    "txt_repetition" -> QueryDef(
      (s, dir) => {
        Tables.rebalance(Tables.documents(s, dir))
          .withColumn("toks", split(trim(col("text")), " "))
          // fused codegen positional bigrams (the zip_with/slice HOF
          // chain is CodegenFallback — see WordGramStrings)
          .withColumn("grams", graft.functions.WordGramStrings
            .wordGramStrings(trim(col("text")), 2, distinct = false))
          .select(
            col("doc_id"),
            (lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")).cast("double")).as("dup_token_ratio"),
            when(size(col("grams")) > 0,
              lit(1.0) - size(array_distinct(col("grams"))).cast("double") /
                size(col("grams")).cast("double"))
              .otherwise(lit(0.0)).as("dup_gram_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        g AS (SELECT doc_id, toks,
          list_transform(range(1, len(toks)),
            i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1]) AS grams
        FROM d)
        SELECT doc_id,
          1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
            AS dup_token_ratio,
          CASE WHEN len(grams) > 0 THEN
            1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
          ELSE 0.0 END AS dup_gram_ratio
        FROM g ORDER BY doc_id""")),

    // ------------------------------------ deterministic hash sampling
    // ~10% corpus sample keyed on the document id hash: reproducible
    // across runs, retries, and engines (rand()-based sampling is none
    // of those); shuffle-free, the filter is evaluated at the scan.
    "samp_hash" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("h", uhash(concat(lit("doc_"), col("doc_id"))))
          .filter(col("h") % 10 === 0)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, lang, source FROM (
          SELECT doc_id, lang, source,
            ${uhashSql("'doc_' || CAST(doc_id AS VARCHAR)")} AS h
          FROM documents)
        WHERE h % 10 = 0 ORDER BY doc_id""")),

    // ----------------------------------- train/val/test split assignment
    // The canonical dataset splitter: id-hash mod 10 → 8/1/1
    // train/val/test. Deterministic (stable across runs, retries, and
    // engines — the property that keeps eval sets leak-free as the
    // corpus is re-processed), shuffle-free per row; the output here is
    // the per-(lang, split) audit count a pipeline logs after assigning.
    "samp_split" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("b", uhash(concat(lit("doc_"), col("doc_id"))) % 10)
          .withColumn("split",
            when(col("b") < 8, "train").when(col("b") === 8, "val")
              .otherwise(lit("test")))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("split"))
      },
      Some(s"""WITH a AS (
          SELECT lang,
            ${uhashSql("'doc_' || CAST(doc_id AS VARCHAR)")} % 10 AS b
          FROM documents)
        SELECT lang,
          CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
            ELSE 'test' END AS split,
          COUNT(*) AS n_docs
        FROM a GROUP BY lang, split ORDER BY lang, split""")),

    // ----------------------------------------- domain-mix rebalancing
    // Downsample every source to the SMALLEST source's volume (uniform
    // mix): per-source keep threshold = floor(min_n * 1e6 / n), keep a
    // doc when its id hash lands below it. The count table is tiny
    // (one row per source) and broadcast; integer threshold math is
    // exact in both engines; the kept set is deterministic.
    "samp_domain_mix" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val counts = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
          .withColumn("min_n", min(col("n")).over(Window.partitionBy()))
          .withColumn("keep_below", (col("min_n") * 1000000L) / col("n"))
          .select(col("source"), col("keep_below"))
        docs.join(broadcast(counts), "source")
          .withColumn("h",
            uhash(concat(lit("doc_"), col("doc_id"))) % 1000000L)
          .filter(col("h") < col("keep_below"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some(s"""WITH c AS (
          SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        t AS (SELECT source, (MIN(n) OVER () * 1000000) // n AS keep_below FROM c),
        k AS (
          SELECT d.source FROM documents d JOIN t ON d.source = t.source
          WHERE ${uhashSql("'doc_' || CAST(d.doc_id AS VARCHAR)")} % 1000000
            < t.keep_below)
        SELECT source, COUNT(*) AS n_kept FROM k
        GROUP BY source ORDER BY source""")),

    // ---------------------------- composed end-to-end curation pipeline
    // The whole pre-training data flow as ONE declared query: quality
    // filter → exact dedup (keep lowest doc_id per normalized text) →
    // deterministic stratified cap per language. Each stage's scale
    // story is inherited from its standalone operator: the filter is a
    // linear scan, dedup is one shuffle on the 64-bit text hash, the
    // cap is one per-lang window. Proves the operators COMPOSE — the
    // stage boundaries stay inside one Catalyst plan, so column pruning
    // and filter pushdown cross them (the scan reads only the needed
    // columns; the quality filter runs before any shuffle).
    "pipe_curate_e2e" -> QueryDef(
      (s, dir) => {
        val kept = Tables.documents(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .withColumn("n_tokens", size(col("toks")))
          .filter(col("n_tokens") >= 5 && col("n_tokens") <= 2000 &&
            expr(s"size(filter(toks, t -> t IN (${PipelineQueries.stopList}))) > 0") &&
            length(col("text")) >= 50)
        val deduped = kept
          .withColumn("dup_rk", row_number().over(
            Window.partitionBy(xxhash64(lower(trim(col("text")))))
              .orderBy(col("doc_id"))))
          .filter(col("dup_rk") === 1)
        deduped
          .withColumn("h", uhash(concat(lit("doc_"), col("doc_id"))))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
          .filter(col("rk") <= StratifiedPerGroup * 2)
          .select(col("lang"), col("rk"), col("doc_id"), col("n_tokens"))
          .orderBy(col("lang"), col("rk"))
      },
      Some(s"""WITH kept AS (
          SELECT doc_id, lang, text,
            len(string_split(trim(text), ' ')) AS n_tokens
          FROM documents
          WHERE len(string_split(trim(text), ' ')) BETWEEN 5 AND 2000
            AND len(list_filter(string_split(trim(text), ' '),
              t -> t IN (${PipelineQueries.stopList}))) > 0
            AND LENGTH(text) >= 50),
        dd AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY lower(trim(text))
            ORDER BY doc_id) AS dup_rk
          FROM kept),
        strat AS (
          SELECT lang, doc_id, n_tokens,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY ${uhashSql("'doc_' || CAST(doc_id AS VARCHAR)")}, doc_id)
              AS rk
          FROM dd WHERE dup_rk = 1)
        SELECT lang, rk, doc_id, n_tokens FROM strat
        WHERE rk <= ${StratifiedPerGroup * 2} ORDER BY lang, rk""")),

    // --------------------------------- sequence packing (concat-chunk)
    // GPT-style packing: per language, concatenate documents in doc_id
    // order and chunk the token stream into PackCtxLen windows. Each doc
    // is assigned the bin where it STARTS plus its offset in that bin —
    // the bookkeeping a packed-pretraining dataloader needs. Windows are
    // per-lang (language-pure contexts), so the running sum never
    // collapses to one partition.
    "pack_sequences" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, dir)
          .withColumn("n_tokens",
            size(split(trim(col("text")), " ")).cast("long"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .select(col("lang"), col("doc_id"), col("n_tokens"),
            expr(s"(cum - n_tokens) div $PackCtxLen").as("bin"),
            ((col("cum") - col("n_tokens")) % PackCtxLen).as("bin_offset"))
          .orderBy(col("lang"), col("doc_id"))
      },
      Some(s"""WITH d AS (
          SELECT lang, doc_id,
            CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT lang, doc_id, n_tokens,
            SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d)
        SELECT lang, doc_id, n_tokens,
          CAST((cum - n_tokens) // $PackCtxLen AS BIGINT) AS bin,
          CAST((cum - n_tokens) % $PackCtxLen AS BIGINT) AS bin_offset
        FROM c ORDER BY lang, doc_id""")),

    // ------------------------------------- stratified per-group sampling
    // Deterministic stratified sample: the first StratifiedPerGroup docs
    // per language in hash order (hash ties broken by doc_id). Unlike
    // rand()-based sampleBy, identical across runs/retries/engines. One
    // shuffle on lang; the per-group window never collapses to a single
    // partition, and the rank filter discards rows before the final sort.
    "samp_stratified" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("h"), col("doc_id"))
        Tables.documents(s, dir)
          .withColumn("h", uhash(concat(lit("doc_"), col("doc_id"))))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= StratifiedPerGroup)
          .select(col("lang"), col("rk"), col("doc_id"), col("source"))
          .orderBy(col("lang"), col("rk"))
      },
      Some(s"""SELECT lang, rk, doc_id, source FROM (
          SELECT lang, doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY ${uhashSql("'doc_' || CAST(doc_id AS VARCHAR)")}, doc_id)
              AS rk
          FROM documents)
        WHERE rk <= $StratifiedPerGroup ORDER BY lang, rk""")),

    // --------------------------------- benchmark decontamination
    // Flag training documents sharing any word-trigram with the eval
    // split (deterministically designated: ~5% of docs by id hash) —
    // the contamination scrub every training pipeline runs before
    // shipping data. Inverted-index join on the (lang, trigram) hash
    // against the DISTINCT eval gram set, so per-key eval fan-out is 1
    // and total work is linear in matching training gram rows — no
    // pairwise stage. At real scale the distinct eval-gram table (one
    // benchmark suite, not a corpus) broadcasts; the shuffle join here
    // is the general, always-safe form.
    "txt_decontaminate" -> QueryDef(
      (s, dir) => {
        // fused codegen gram stage (see dedup_ngram_jaccard): identical
        // trigram semantics to the transform/array_distinct chain
        val docs = Tables.rebalance(Tables.documents(s, dir))
          .withColumn("split_h",
            uhash(concat(lit("doc_"), col("doc_id"))) % 20)
          .withColumn("ghs", graft.functions.WordGramHashes.wordGramHashes(
            col("text"), 3, concat(col("lang"), lit("|"))))
          .select(col("doc_id"), col("split_h"),
            explode(col("ghs")).as("gh"))
        val evalGrams = docs.filter(col("split_h") === 1)
          .select(col("gh")).distinct()
        docs.filter(col("split_h") =!= 1)
          .join(evalGrams, Seq("gh"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("gh")).as("n_shared_grams"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH g AS (
          SELECT doc_id,
            ${uhashSql("'doc_' || CAST(doc_id AS VARCHAR)")} % 20 AS split_h,
            lang,
            CASE WHEN len(string_split(trim(text), ' ')) >= 3 THEN
              list_distinct(list_transform(
                range(1, len(string_split(trim(text), ' ')) - 1),
                i -> string_split(trim(text), ' ')[CAST(i AS INTEGER)] || ' ' ||
                     string_split(trim(text), ' ')[CAST(i AS INTEGER) + 1] || ' ' ||
                     string_split(trim(text), ' ')[CAST(i AS INTEGER) + 2]))
            ELSE [] END AS grams
          FROM documents),
        e AS (SELECT doc_id, split_h,
            ${uhashSql("lang || '|' || g2.gram")} AS gh
          FROM g, unnest(g.grams) AS g2(gram)),
        ev AS (SELECT DISTINCT gh FROM e WHERE split_h = 1)
        SELECT e.doc_id, COUNT(DISTINCT e.gh) AS n_shared_grams
        FROM e JOIN ev ON e.gh = ev.gh
        WHERE e.split_h <> 1
        GROUP BY e.doc_id ORDER BY e.doc_id""")),

    // ----------------------------------------- BM25 retrieval scoring
    // Full-text relevance ranking: top-20 documents for a fixed query
    // under BM25 (k1 = 1.2, b = 0.75) — the scorer behind every search
    // index, expressed as three keyed aggregations + one broadcast of
    // the corpus stats (N, avgdl: a 1-row aggregate, in-plan). All
    // inputs to the formula are exact integers; ln() and double
    // arithmetic are bit-identical across engines; round(6) output.
    "txt_search_bm25" -> QueryDef(
      (s, dir) => {
        val qTerms = Seq("scan", "join", "merge")
        val docs = Tables.rebalance(Tables.documents(s, dir))
        // doc length = token-array SIZE: a per-row projection — the
        // old explode → groupBy(doc_id) paid a corpus-wide shuffle for
        // a number the row already knows (split of "" is [""], so
        // membership and counts match the exploded form exactly)
        val dlen = docs.select(col("doc_id"),
          size(split(trim(col("text")), " ")).cast("long").as("dl"))
        val stats = dlen.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).as("total_len"))
        val tf = docs
          .select(col("doc_id"),
            explode(split(trim(col("text")), " ")).as("term"))
          .filter(col("term").isin(qTerms: _*))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val scored = tf
          .join(dlen, "doc_id")
          .join(broadcast(df), "term")
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            col("total_len").cast("double") / col("n_docs").cast("double"))
          .withColumn("idf", log(
            (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
              (col("df").cast("double") + 0.5) + 1.0))
          .withColumn("s", col("idf") *
            (col("tf").cast("double") * 2.2) /
            (col("tf").cast("double") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
          // per-doc sum over the 3 query terms: tiny decimal-cast sum
          // keeps the addition order-independent
          .groupBy(col("doc_id"))
          .agg(round(sum(col("s").cast("decimal(28,15)")).cast("double"), 6)
            .as("bm25"))
        // orderBy+limit compiles to TakeOrderedAndProject (per-partition
        // top-k + driver merge — no global sort); the rank window then
        // runs over just 20 rows
        scored.orderBy(col("bm25").desc, col("doc_id")).limit(20)
          .withColumn("rk", row_number().over(
            Tables.tinyGlobalWindow(col("bm25").desc, col("doc_id"))))
          .select(col("rk"), col("doc_id"), col("bm25"))
          .orderBy(col("rk"))
      },
      Some("""WITH t AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
          FROM documents),
        dlen AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dlen),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM t
          WHERE term IN ('scan', 'join', 'merge') GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
            ln((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
               (CAST(df.df AS DOUBLE) + 0.5) + 1.0) *
            (CAST(tf.tf AS DOUBLE) * 2.2) /
            (CAST(tf.tf AS DOUBLE) + 1.2 *
              (0.25 + 0.75 * CAST(dl AS DOUBLE) /
                (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS s
          FROM tf JOIN dlen ON tf.doc_id = dlen.doc_id
          JOIN df ON tf.term = df.term CROSS JOIN stats),
        agg AS (
          SELECT doc_id,
            ROUND(CAST(SUM(CAST(s AS DECIMAL(28,15))) AS DOUBLE), 6) AS bm25
          FROM scored GROUP BY doc_id),
        rk AS (
          SELECT doc_id, bm25,
            ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
          FROM agg)
        SELECT rk, doc_id, bm25 FROM rk WHERE rk <= 20 ORDER BY rk""")),

    // -------------------------------- bigram LM cross-entropy scoring
    // Conditional language-model quality signal: per-doc mean
    // -ln p(w_i | w_{i-1}) under the corpus bigram model
    // (p = c(bigram) / c(prefix)) — sharper than the unigram
    // txt_cross_entropy at spotting word-salad documents whose
    // unigrams look normal. Counts are exact ints, ln() and double
    // division are bit-identical across engines, per-doc sums use
    // decimal(28,15) casts (order-independent), outputs round(6).
    // The model join keys on the bigram string — a shuffle join (the
    // corpus model at 100 TB is not broadcastable); per-doc rows are
    // then one keyed aggregation.
    "txt_bigram_entropy" -> QueryDef(
      (s, dir) => {
        val inst = Tables.rebalance(Tables.documents(s, dir))
          .select(col("doc_id"), explode(graft.functions.WordGramStrings
            .wordGramStrings(trim(col("text")), 2, distinct = false))
            .as("bg"))
        val cb = inst.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
        // prefix counts FOLD OUT OF the bigram counts (each instance
        // has exactly one bigram, so summing cb by prefix equals
        // counting instances by prefix): the prefix model aggregates
        // |distinct bigrams| rows instead of re-scanning and
        // re-shuffling the full instance explode — and cb's exchange
        // is reused between the two consumers, so the corpus explode
        // is evaluated twice per run, not three times
        val cp = cb
          .groupBy(substring_index(col("bg"), " ", 1).as("w"))
          .agg(sum(col("cb")).as("cp"))
        val model = cb.join(cp, substring_index(cb("bg"), " ", 1) === cp("w"))
          .select(col("bg"),
            (-log(col("cb").cast("double") / col("cp").cast("double")))
              .cast("decimal(28,15)").as("lp"))
        inst.join(model, "bg")
          .groupBy(col("doc_id"))
          .agg(round(sum(col("lp")).cast("double") / count(lit(1)), 6)
            .as("bigram_entropy"),
            count(lit(1)).as("n_bigrams"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        b AS (
          SELECT doc_id, unnest(list_transform(range(1, len(toks)),
            i -> toks[CAST(i AS INTEGER)] || ' ' ||
                 toks[CAST(i AS INTEGER) + 1])) AS bg
          FROM d),
        cb AS (SELECT bg, COUNT(*) AS cb FROM b GROUP BY bg),
        cp AS (SELECT split_part(bg, ' ', 1) AS w, COUNT(*) AS cp
          FROM b GROUP BY split_part(bg, ' ', 1)),
        m AS (
          SELECT cb.bg,
            CAST(-ln(CAST(cb.cb AS DOUBLE) / CAST(cp.cp AS DOUBLE))
              AS DECIMAL(28,15)) AS lp
          FROM cb JOIN cp ON split_part(cb.bg, ' ', 1) = cp.w)
        SELECT b.doc_id,
          ROUND(CAST(SUM(m.lp) AS DOUBLE) / COUNT(*), 6) AS bigram_entropy,
          COUNT(*) AS n_bigrams
        FROM b JOIN m ON b.bg = m.bg
        GROUP BY b.doc_id ORDER BY b.doc_id""")),

    // ------------------------------------------------- TF-IDF scoring
    // Top-5 characteristic terms per document by tf·idf — the feature
    // extractor behind keyword search, topic drift monitoring, and
    // relevance-weighted dedup. All aggregates key on doc_id or term
    // (two shuffles, both partially aggregated), the corpus size N is a
    // broadcast 1-row aggregate (in-plan — no driver-side count, the
    // txt_cross_entropy pattern), and ln()/double division are
    // bit-identical across engines, so round(6) outputs hash-match.
    // Ties broken by term (binary UTF-8 ordering in both engines).
    "txt_tfidf" -> QueryDef(
      (s, dir) => {
        val docs = Tables.rebalance(Tables.documents(s, dir))
        val toks = docs.select(col("doc_id"),
          explode(split(trim(col("text")), " ")).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("cnt"))
        // doc length FOLDS OUT OF tf (each token instance lands in
        // exactly one (doc, term) cell, so summing cnt by doc equals
        // counting tokens by doc): tf's exchange is reused between its
        // consumers and the corpus explode is evaluated once, not twice
        val dlen = tf.groupBy(col("doc_id")).agg(sum(col("cnt")).as("dl"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf
          .join(dlen, "doc_id")
          .join(df, "term")
          .crossJoin(broadcast(n))
          .withColumn("tfidf", round(
            (col("cnt").cast("double") / col("dl").cast("double")) *
              log(col("n_docs").cast("double") / col("df").cast("double")), 6))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        scored
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH t AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
          FROM documents),
        dlen AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
        tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM t
          GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
            ROUND((CAST(cnt AS DOUBLE) / CAST(dl AS DOUBLE)) *
              ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
          FROM tf JOIN dlen ON tf.doc_id = dlen.doc_id
          JOIN df ON tf.term = df.term CROSS JOIN n),
        rk AS (
          SELECT doc_id, term, tfidf,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term) AS rk
          FROM scored)
        SELECT doc_id, rk, term, tfidf FROM rk
        WHERE rk <= 5 ORDER BY doc_id, rk""")),

    // ------------------------------------ embedding norm extremes
    // Data-quality screen for the vector corpus: the 5 largest-norm
    // vectors per label — where corrupt embeddings (un-normalized,
    // overflowed, wrong-scaled) surface first. norm² is the bit-exact
    // sequential-fold ArrayDot (no order-dependent float sum), ranking
    // is tie-broken by vec_id; one shuffle on label, top-k discards
    // before the final sort.
    "emb_norm_extremes" -> QueryDef(
      (s, dir) => {
        val v = Tables.rebalance(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
          .withColumn("norm2", round(
            graft.functions.VectorOps.arrayDot(col("v"), col("v")), 6))
        val w = Window.partitionBy(col("label"))
          .orderBy(col("norm2").desc, col("vec_id"))
        v.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("label"), col("rk"), col("vec_id"), col("norm2"))
          .orderBy(col("label"), col("rk"))
      },
      Some("""WITH e AS (
          SELECT vec_id, label,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        n2 AS (
          SELECT vec_id, label,
            ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(range(1, len(v) + 1),
                i -> v[CAST(i AS INTEGER)] * v[CAST(i AS INTEGER)])),
              (acc, x) -> acc + x), 6) AS norm2
          FROM e),
        r AS (
          SELECT label, vec_id, norm2,
            ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY norm2 DESC, vec_id) AS rk
          FROM n2)
        SELECT label, rk, vec_id, norm2 FROM r
        WHERE rk <= 5 ORDER BY label, rk""")),

    // ----------------------------------- int8 embedding quantization
    // Symmetric per-vector int8 quantization (q = round(x·127/max|x|))
    // — the compression step before shipping embeddings to an ANN
    // index. Pure per-row array math, shuffle-free and linear; float→
    // double casts are exact and the double ops are IEEE-identical in
    // both engines, so the quantized values hash-match exactly. Emits
    // one row per (vector, dimension) for a full-exactness check;
    // dim ≤ 8 keeps the declared result compact.
    "emb_quantize_int8" -> QueryDef(
      (s, dir) => {
        Tables.embeddings(s, dir)
          .withColumn("scale",
            array_max(expr("transform(embedding, x -> abs(cast(x as double)))")))
          .select(col("vec_id"), col("scale"), posexplode(col("embedding")))
          .filter(col("pos") < 8)
          .select(col("vec_id"), (col("pos") + 1).as("dim"),
            when(col("scale") > 0,
              round(col("col").cast("double") * 127.0 / col("scale"), 0))
              .otherwise(lit(0.0)).cast("int").as("q"))
          .orderBy(col("vec_id"), col("dim"))
      },
      Some("""WITH v AS (
          SELECT vec_id,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
              AS scale,
            unnest(range(1, len(embedding) + 1)) AS dim,
            unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
          FROM embeddings)
        SELECT vec_id, dim,
          CAST(CASE WHEN scale > 0 THEN ROUND(x * 127.0 / scale, 0)
            ELSE 0.0 END AS INTEGER) AS q
        FROM v WHERE dim <= 8 ORDER BY vec_id, dim""")),

    // ------------------------------------- packing-waste planning
    // Context-length planning analytic: if documents are packed
    // WITHOUT crossing document boundaries (each doc padded to its own
    // ceil(n/ctx) bins — the isolation-preserving alternative to
    // pack_sequences' concat-chunk), how much capacity is padding at
    // ctx ∈ {256, 512, 1024}? Pure integer math per row + one tiny
    // aggregate — the number a team looks at before picking a context
    // length. ((n + ctx - 1) div ctx is ceiling division on the
    // positive token counts, identical in both engines.)
    "pack_waste" -> QueryDef(
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("n", size(split(trim(col("text")), " ")).cast("long"))
        Seq(256, 512, 1024).map { ctx =>
          d.select(lit(ctx).as("ctx"), col("n"),
            expr(s"((n + ${ctx - 1}) div $ctx) * $ctx").as("cap"))
            .groupBy(col("ctx"))
            .agg(sum(col("n")).as("tokens"),
              sum(col("cap")).as("capacity"),
              round((sum(col("cap")) - sum(col("n"))).cast("double") /
                sum(col("cap")).cast("double"), 6).as("waste_ratio"))
        }.reduce(_ unionAll _)
          .orderBy(col("ctx"))
      },
      Some("""WITH d AS (
          SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
          FROM documents),
        x AS (
          SELECT ctx, n, ((n + ctx - 1) // ctx) * ctx AS cap
          FROM d, (SELECT unnest([256, 512, 1024]) AS ctx))
        SELECT ctx, CAST(SUM(n) AS BIGINT) AS tokens,
          CAST(SUM(cap) AS BIGINT) AS capacity,
          ROUND(CAST(SUM(cap) - SUM(n) AS DOUBLE) / CAST(SUM(cap) AS DOUBLE), 6)
            AS waste_ratio
        FROM x GROUP BY ctx ORDER BY ctx""")),

    // ------------------------------------------ exact grouped percentiles
    // Spark's exact `percentile` and DuckDB's `quantile_cont` both
    // linear-interpolate over the sorted values; outputs rounded to 6dp
    // to absorb the last-ulp interpolation difference.
    "rel_percentiles" -> QueryDef(
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(percentile(col("o_totalprice"),
            array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
          .select(col("o_orderstatus"), posexplode(col("qs")))
          .select(col("o_orderstatus"), (col("pos") + 1).as("q"),
            round(col("col"), 6).as("value"))
          .orderBy(col("o_orderstatus"), col("q"))
      },
      Some("""WITH p AS (
          SELECT o_orderstatus,
            quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS qs
          FROM orders GROUP BY o_orderstatus)
        SELECT o_orderstatus,
          CAST(unnest(range(1, 4)) AS INTEGER) AS q,
          ROUND(unnest(qs), 6) AS value
        FROM p ORDER BY o_orderstatus, q""")),

    // --------------------------------- temperature-based mixture weights
    // The pretraining-mix math (T5/UL2 style): per-source sampling
    // rates proportional to n^α with α = 0.5, flattening the natural
    // distribution toward uniform — small sources get boosted, huge
    // ones damped. Pure arithmetic over the tiny per-source count
    // table; α = 0.5 is computed with sqrt, which IEEE requires to be
    // correctly rounded in BOTH engines (unlike pow), and the weight is
    // pinned to exact decimal before the normalizing sum so the result
    // is bit-reproducible. The `boost` column is rate / natural-rate —
    // the factor each source is over- or under-sampled by.
    "samp_temperature" -> QueryDef(
      (s, dir) => {
        val c = Tables.documents(s, dir)
          .groupBy(col("source")).agg(count(lit(1)).as("n"))
          .withColumn("w",
            sqrt(col("n").cast("double")).cast("decimal(28,12)"))
        val z = c.agg(sum(col("w")).as("z"), sum(col("n")).as("total"))
        c.crossJoin(broadcast(z))
          .select(col("source"), col("n"),
            round(col("w").cast("double") / col("z").cast("double"), 6)
              .as("mix_rate"),
            round((col("w").cast("double") / col("z").cast("double")) /
              (col("n").cast("double") / col("total").cast("double")), 6)
              .as("boost"))
          .orderBy(col("source"))
      },
      Some("""WITH c AS (
          SELECT source, COUNT(*) AS n,
            CAST(sqrt(CAST(COUNT(*) AS DOUBLE)) AS DECIMAL(28,12)) AS w
          FROM documents GROUP BY source),
        z AS (SELECT SUM(w) AS z, CAST(SUM(n) AS BIGINT) AS total FROM c)
        SELECT source, n,
          ROUND(CAST(w AS DOUBLE) / CAST(z AS DOUBLE), 6) AS mix_rate,
          ROUND((CAST(w AS DOUBLE) / CAST(z AS DOUBLE)) /
            (CAST(n AS DOUBLE) / CAST(total AS DOUBLE)), 6) AS boost
        FROM c, z ORDER BY source""")),

    // ------------------------------------ quality-weighted sampling
    // Deterministic weighted downsampling: each doc survives with
    // probability proportional to a quality proxy (here length, capped
    // at 1000 chars ⇒ per-mille weight), decided by comparing the doc's
    // stable id-hash against its own weight — the retry-safe form of
    // rand() < w that training-data reruns need (identical sample on
    // every execution, any partitioning, both engines). Shuffle-free:
    // a scan-side filter that pushes nothing but the projection.
    "samp_weighted" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("w_mille", least(col("n_chars"), lit(1000L)))
          .filter(uhash(concat(lit("wdoc_"), col("doc_id"))) % 1000L <
            col("w_mille"))
          .select(col("doc_id"), col("lang"), col("w_mille"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, lang,
          least(n_chars, 1000) AS w_mille
        FROM documents
        WHERE ${uhashSql("'wdoc_' || CAST(doc_id AS VARCHAR)")} % 1000
          < least(n_chars, 1000)
        ORDER BY doc_id""")),

    // -------------------------- stratified reservoir (per-language top-k)
    // A k-row-per-stratum uniform sample without replacement: keep the
    // k smallest deterministic hash priorities per language — top-k of
    // a random permutation, reproducible across engines AND across
    // epochs, which is what makes it a RESERVOIR: the streaming twin
    // (StreamingReservoir) folds any epoch split to this exact row
    // set, and its weighted arm (Efraimidis–Spirakis −ln(u)/w keys)
    // upgrades it to probability-proportional-to-weight curation
    // sampling. Scale: partial WindowGroupLimit keeps k per stratum
    // per map partition before the shuffle; the sample is k rows per
    // stratum regardless of corpus size.
    "samp_reservoir_groups" -> QueryDef(
      (s, dir) => {
        val K = 16
        val prio = uhash(concat(lit("res_"), col("doc_id").cast("string")))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("priority"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("lang"), col("doc_id"), prio.as("priority"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= K).drop("rn")
          .orderBy(col("lang"), col("priority"), col("doc_id"))
      },
      Some(s"""WITH p AS (
          SELECT lang, doc_id,
            ${uhashSql("'res_' || CAST(doc_id AS VARCHAR)")} AS priority
          FROM documents),
        r AS (
          SELECT lang, doc_id, priority,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY priority, doc_id) AS rn
          FROM p)
        SELECT lang, doc_id, priority FROM r WHERE rn <= 16
        ORDER BY lang, priority, doc_id""")),

    // ------------------------------------ boilerplate phrase mining
    // Cross-document repeated-phrase detection: 5-word phrases that
    // appear in many DISTINCT documents are boilerplate (headers,
    // licenses, navigation chrome) — the phrase list a cleaning pass
    // subtracts before dedup so shared chrome doesn't glue unrelated
    // docs together. Per-doc DISTINCT phrases (array_distinct inside
    // the row) before the document-frequency aggregate, so a doc
    // repeating its own phrase doesn't inflate df.
    //
    // The df aggregate is HASH-KEYED (the txt_dup_spans 3-phase
    // design): phase 1 counts document frequency per 8-byte
    // xxhash64(phrase) — the dominant shuffle carries 16-byte rows
    // instead of full phrase strings, map-side combined. Phase 2
    // semi-joins the ≥MinDf hash survivors back onto the occurrences
    // so only surviving occurrences' strings ever shuffle. The
    // survivor set is NOT bounded — df≥MinDf is a lower-bound filter,
    // so the set grows roughly with corpus size (every common 5-gram
    // qualifies at 100 TB) — hence NO forced broadcast: AQE picks
    // broadcast when the survivor side measures small at runtime and
    // falls back to a shuffled join when it doesn't, which is exactly
    // the scale-adaptive behavior a hint would destroy. Phase 3
    // re-aggregates BY EXACT STRING and re-applies the threshold on
    // exact counts — a hash collision can only merge counts upward in
    // phase 1, i.e. only ADD candidates that phase 3 then rejects, so
    // the output is collision-exact by the superset argument.
    "txt_boilerplate" -> QueryDef(
      (s, dir) => {
        val MinDf = 3
        // fused codegen per-doc distinct 5-grams: this subtree is
        // evaluated on BOTH sides of the semi-join below, so the old
        // interpreted transform/slice/concat_ws chain (CodegenFallback,
        // one interpreter re-entry per window) was paid twice per doc;
        // short texts yield an empty array, replacing the >= 5 filter
        val occ = Tables.rebalance(Tables.documents(s, dir))
          .select(explode(graft.functions.WordGramStrings
            .wordGramStrings(trim(col("text")), 5, distinct = true))
            .as("phrase"))
          .withColumn("ph", xxhash64(col("phrase")))
        val survivors = occ.groupBy(col("ph"))
          .agg(count(lit(1)).as("dfh"))
          .filter(col("dfh") >= MinDf)
          .select(col("ph"))
        occ.join(survivors, Seq("ph"), "left_semi")
          .groupBy(col("phrase"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") >= MinDf)
          .orderBy(col("df").desc, col("phrase"))
      },
      Some("""WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents
          WHERE len(string_split(trim(text), ' ')) >= 5),
        p AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(0, len(toks) - 4),
            i -> array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 5 AS INTEGER)], ' ')))) AS phrase
          FROM t)
        SELECT phrase, COUNT(*) AS df
        FROM p GROUP BY phrase HAVING COUNT(*) >= 3
        ORDER BY df DESC, phrase""")),

    // ------------------------------------- per-document novelty score
    // The inverse of the boilerplate census, per document: what
    // fraction of a doc's distinct 5-grams appear in NO other document
    // (df == 1). Curation pipelines weight dedup-priority / mixing by
    // novelty — a doc whose grams are all shared is template mass, a
    // high-novelty doc carries unique content. Scale shape: grams are
    // carried as the (gh1, gh2) double hash (two independent xxhash64
    // seeds — the txt_dup_spans exactness contract: a false merge
    // needs a simultaneous 128-bit collision, ~never at 10^12 grams),
    // so no exchange carries a gram string; df is a map-side-combined
    // count on 16-byte keys and the per-doc fold is O(doc grams). The
    // DuckDB oracle stays string-exact.
    "txt_novelty" -> QueryDef(
      (s, dir) => {
        val grams = Tables.rebalance(Tables.documents(s, dir))
          .select(col("doc_id"), explode(graft.functions.WordGramStrings
            .wordGramStrings(trim(col("text")), 5, distinct = true))
            .as("phrase"))
          .select(col("doc_id"),
            xxhash64(col("phrase")).as("gh1"),
            xxhash64(lit(0x9e3779b9L), col("phrase")).as("gh2"))
        val dfc = grams.groupBy(col("gh1"), col("gh2"))
          .agg(count(lit(1)).as("dfc"))
        grams.join(dfc, Seq("gh1", "gh2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("dfc") === 1, 1L).otherwise(0L)).as("n_novel"))
          .withColumn("novelty",
            col("n_novel").cast("double") / col("n_grams").cast("double"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents
          WHERE len(string_split(trim(text), ' ')) >= 5),
        p AS (
          SELECT DISTINCT doc_id, phrase FROM (
            SELECT doc_id, unnest(list_transform(
              range(0, len(toks) - 4),
              i -> array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 5 AS INTEGER)], ' '))) AS phrase
            FROM t)),
        d AS (SELECT phrase, COUNT(*) AS dfc FROM p GROUP BY phrase)
        SELECT p.doc_id,
               COUNT(*) AS n_grams,
               COUNT(*) FILTER (WHERE d.dfc = 1) AS n_novel,
               CAST(COUNT(*) FILTER (WHERE d.dfc = 1) AS DOUBLE)
                 / COUNT(*) AS novelty
        FROM p JOIN d USING (phrase)
        GROUP BY p.doc_id
        ORDER BY p.doc_id""")),

    // ------------------------- sliding-window chunking (size/stride)
    // The context-window chunker that feeds packing: each document is
    // cut into 128-token chunks on a 96-token stride (32-token overlap
    // so no boundary context is lost), the last chunk keeping whatever
    // remains. Pure per-row integer math — a generate-and-explode with
    // no shuffle at any corpus size; chunk boundaries are (doc_id,
    // chunk_idx)-addressed so the downstream tokenizer can fetch slices
    // without re-reading neighbors.
    "docs_chunk_overlap" -> QueryDef(
      (s, dir) => {
        val (size_, stride) = (128, 96)
        Tables.documents(s, dir)
          .withColumn("n",
            size(split(trim(col("text")), " ")).cast("long"))
          .select(col("doc_id"), col("n"),
            explode(expr(s"sequence(CAST(0 AS BIGINT), (n - 1) div $stride)"))
              .as("chunk_idx"))
          .select(col("doc_id"), col("chunk_idx"),
            (col("chunk_idx") * stride).as("start_tok"),
            least(lit(size_.toLong), col("n") - col("chunk_idx") * stride)
              .as("n_toks"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH d AS (
          SELECT doc_id,
            CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
          FROM documents),
        c AS (SELECT doc_id, n,
            unnest(range(0, (n - 1) // 96 + 1)) AS chunk_idx
          FROM d)
        SELECT doc_id, chunk_idx,
          chunk_idx * 96 AS start_tok,
          least(128, n - chunk_idx * 96) AS n_toks
        FROM c ORDER BY doc_id, chunk_idx""")),

    // ----------------------- model-based quality scoring (linear head)
    // Inference for a trained quality classifier: a fixed linear model
    // over cheap per-document features (token count, mean token length,
    // stopword ratio, type-token ratio), squashed with softsign
    // z/(1+|z|) instead of a sigmoid — softsign is exact double
    // arithmetic (add/mul/div/abs only), so the score is bit-identical
    // across engines where exp() differs in the last ulp. Per-row math,
    // no shuffle; swapping in real trained weights changes constants,
    // not the plan.
    "docs_quality_model" -> QueryDef(
      (s, dir) => {
        val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on",
          "for", "with").map(w => s"'$w'").mkString(", ")
        Tables.documents(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .withColumn("nw", size(col("toks")).cast("double"))
          .withColumn("mtl",
            length(replace(col("text"), lit(" "), lit(""))).cast("double")
              / col("nw"))
          .withColumn("stopr",
            expr(s"size(filter(toks, t -> t IN ($stop)))").cast("double")
              / col("nw"))
          .withColumn("ttr",
            size(array_distinct(col("toks"))).cast("double") / col("nw"))
          .withColumn("z",
            col("nw") * 0.01 + col("mtl") * 0.5 + col("stopr") * -2.0
              + col("ttr") * 3.0 + -4.1)
          .select(col("doc_id"),
            (col("z") / (abs(col("z")) + 1.0)).as("score"),
            when(col("z") > 0, 1L).otherwise(0L).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id, text, string_split(trim(text), ' ') AS toks
          FROM documents),
        f AS (SELECT doc_id,
            CAST(len(toks) AS DOUBLE) AS nw,
            CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
              / CAST(len(toks) AS DOUBLE) AS mtl,
            CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and',
              'to', 'in', 'is', 'on', 'for', 'with'))) AS DOUBLE)
              / CAST(len(toks) AS DOUBLE) AS stopr,
            CAST(len(list_distinct(toks)) AS DOUBLE)
              / CAST(len(toks) AS DOUBLE) AS ttr
          FROM d),
        z AS (SELECT doc_id,
            nw * 0.01 + mtl * 0.5 + stopr * -2.0 + ttr * 3.0 + -4.1 AS z
          FROM f)
        SELECT doc_id, z / (abs(z) + 1.0) AS score,
          CAST(CASE WHEN z > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM z ORDER BY doc_id""")),

    // ---------------------- fractional-epoch repetition (mix planning)
    // Pretraining mixes repeat high-value sources a FRACTIONAL number
    // of epochs (e.g. 2.3×): every doc gets floor(rate) copies, plus
    // one more for the deterministic hash-chosen `frac` of docs — so
    // the realized rate converges to the target per source while
    // staying reproducible across runs and task retries (a rand()
    // lottery is neither). Rates here derive from the source-name hash
    // (swap in a curated table without changing the plan); per-row
    // integer math + one keyed aggregate, shuffle-free until the tiny
    // audit rollup.
    "samp_epoch_mix" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("rate_micro",
            lit(500000L) + uhash(col("source")) % 2000001L)
          .withColumn("dh",
            uhash(concat(lit("doc_"), col("doc_id"))) % 1000000L)
          .withColumn("copies",
            expr("rate_micro div 1000000") +
              when(col("dh") < col("rate_micro") % 1000000L, 1L)
                .otherwise(0L))
          .groupBy(col("source"), col("rate_micro"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("copies")).as("n_emitted"))
          .orderBy(col("source"))
      },
      Some(s"""WITH r AS (
          SELECT doc_id, source,
            500000 + (${uhashSql("source")} % 2000001) AS rate_micro,
            ${uhashSql("'doc_' || CAST(doc_id AS VARCHAR)")} % 1000000 AS dh
          FROM documents)
        SELECT source, rate_micro, COUNT(*) AS n_docs,
          CAST(SUM(rate_micro // 1000000 +
            CASE WHEN dh < rate_micro % 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_emitted
        FROM r GROUP BY source, rate_micro ORDER BY source""")),

    // ------------------------ per-dimension embedding standardization
    // Whitening (z-scoring) each embedding dimension before clustering
    // or quantization: per-dim mean and second moment as ORDER-
    // INDEPENDENT exact-decimal sums (the Ivf.codebook contract),
    // quantized to 6 dp so variance — and therefore every standardized
    // value — is bit-reproducible regardless of shuffle order. The
    // 64-row stats table is broadcast back onto the scan: two linear
    // passes, one tiny shuffle keyed on dim. Output: the first 8
    // standardized dims of every 100th vector (the audit sample).
    "emb_whiten" -> QueryDef(
      (s, dir) => {
        val vecs = Tables.rebalance(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val stats = vecs.select(posexplode(col("v")))
          .groupBy(col("pos"))
          .agg(
            round(sum(col("col").cast("decimal(28,14)")).cast("double")
              / count(lit(1)), 6).as("m"),
            round(sum((col("col") * col("col")).cast("decimal(28,14)"))
              .cast("double") / count(lit(1)), 6).as("msq"))
          .select((col("pos") + 1).as("dim"), col("m"),
            (col("msq") - col("m") * col("m")).as("var"))
        vecs.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id"), posexplode(col("v")))
          .select(col("vec_id"), (col("pos") + 1).as("dim"),
            col("col").as("x"))
          .filter(col("dim") <= 8)
          .join(broadcast(stats), "dim")
          .select(col("vec_id"), col("dim"),
            when(col("var") > 0,
              round((col("x") - col("m")) / sqrt(col("var")), 6))
              .otherwise(lit(0.0)).as("w"))
          .orderBy(col("vec_id"), col("dim"))
      },
      Some("""WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        u AS (SELECT vec_id,
            unnest(range(1, len(v) + 1)) AS dim,
            unnest(v) AS x
          FROM e),
        st AS (SELECT dim,
            ROUND(CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE)
              / COUNT(*), 6) AS m,
            ROUND(CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE)
              / COUNT(*), 6) AS msq
          FROM u GROUP BY dim),
        s2 AS (SELECT dim, m, msq - m * m AS var FROM st)
        SELECT u.vec_id, u.dim,
          CASE WHEN s2.var > 0
            THEN ROUND((u.x - s2.m) / sqrt(s2.var), 6)
            ELSE 0.0 END AS w
        FROM u JOIN s2 USING (dim)
        WHERE u.vec_id % 100 = 0 AND u.dim <= 8
        ORDER BY u.vec_id, u.dim""")),

    // ------------------------ token-length distribution (log2 buckets)
    // The context-length planning input (pack_waste's upstream): docs
    // and token mass per power-of-two length bucket. One keyed
    // aggregate over a per-row bucket id — O(log max_len) output rows
    // at any corpus size. floor(log2(n)) via bit length keeps the
    // bucket id in exact integer math (no cross-engine log() doubles).
    "docs_length_histogram" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("n",
            size(split(trim(col("text")), " ")).cast("long"))
          .withColumn("bucket",
            when(col("n") <= 0, lit(0L))
              .otherwise(length(bin(col("n"))).cast("long") - 1))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
            min(col("n")).as("min_len"), max(col("n")).as("max_len"))
          .orderBy(col("bucket"))
      },
      Some("""WITH d AS (
          SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n
          FROM documents),
        b AS (SELECT n,
            CASE WHEN n <= 0 THEN 0
              ELSE CAST(LENGTH(bin(n)) - 1 AS BIGINT) END AS bucket
          FROM d)
        SELECT bucket, COUNT(*) AS n_docs,
          CAST(SUM(n) AS BIGINT) AS n_tokens,
          MIN(n) AS min_len, MAX(n) AS max_len
        FROM b GROUP BY bucket ORDER BY bucket""")),

    // ------------------------------- curriculum ordering into shards
    // Short→long curriculum: every document gets a dense global
    // curriculum position ordered by (n_chars, doc_id) and a contiguous
    // shard assignment (8 shards), so shard 0 holds the shortest docs
    // and training consumes shards in order. The global rank is built
    // WITHOUT a single-partition sort (the rel_global_ids pattern over
    // a coarser key): row_number within each 256-char length bucket,
    // plus broadcast prefix offsets from the O(max_len/256)-row bucket
    // count table — the tiny table is the only unpartitioned window.
    // Shard = gid * 8 div total via a broadcast 1-row count.
    "pipe_curriculum" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"))
          .withColumn("bucket", expr("n_chars div 256"))
        val offsets = docs.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
          .withColumn("offset",
            coalesce(sum(col("n")).over(
              Tables.tinyGlobalWindow(col("bucket"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("bucket"), col("offset"))
        val total = docs.agg(count(lit(1)).as("total"))
        docs.withColumn("rk", row_number().over(
            Window.partitionBy(col("bucket"))
              .orderBy(col("n_chars"), col("doc_id"))).cast("long"))
          .join(broadcast(offsets), "bucket")
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("n_chars"),
            (col("offset") + col("rk") - 1).as("gid"),
            expr("(offset + rk - 1) * 8 div total").as("shard"))
          .orderBy(col("gid"))
      },
      Some("""WITH r AS (
          SELECT doc_id, n_chars,
            CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1
              AS BIGINT) AS gid,
            CAST(COUNT(*) OVER () AS BIGINT) AS total
          FROM documents)
        SELECT doc_id, n_chars, gid,
          CAST(gid * 8 // total AS BIGINT) AS shard
        FROM r ORDER BY gid""")),

    // -------------------- standardized-distance outlier screen (top-20)
    // Diagonal-Mahalanobis outliers: per vector, sum over dims of
    // ((x−m)/sd)² against the same 6 dp-quantized whitening stats —
    // the screen that catches corrupt/degenerate vectors a plain norm
    // check misses (emb_norm_extremes' complement: a vector can have a
    // normal norm but sit far out on a few dims). Per-dim terms are
    // cast to exact decimal before the per-vector sum, so the score is
    // independent of aggregation order; top-20 is a TakeOrdered, not a
    // global sort.
    "emb_outlier" -> QueryDef(
      (s, dir) => {
        val vecs = Tables.rebalance(Tables.embeddings(s, dir))
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val stats = vecs.select(posexplode(col("v")))
          .groupBy(col("pos"))
          .agg(
            round(sum(col("col").cast("decimal(28,14)")).cast("double")
              / count(lit(1)), 6).as("m"),
            round(sum((col("col") * col("col")).cast("decimal(28,14)"))
              .cast("double") / count(lit(1)), 6).as("msq"))
          .select(col("pos"), col("m"),
            (col("msq") - col("m") * col("m")).as("var"))
          .filter(col("var") > 0)
        vecs.select(col("vec_id"), posexplode(col("v")))
          .join(broadcast(stats), "pos")
          .select(col("vec_id"),
            (((col("col") - col("m")) / sqrt(col("var"))) *
              ((col("col") - col("m")) / sqrt(col("var"))))
              .cast("decimal(28,12)").as("t"))
          .groupBy(col("vec_id"))
          .agg(round(sum(col("t")).cast("double"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(20)
      },
      Some("""WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        u AS (SELECT vec_id,
            unnest(range(1, len(v) + 1)) - 1 AS pos,
            unnest(v) AS x
          FROM e),
        st AS (SELECT pos,
            ROUND(CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE)
              / COUNT(*), 6) AS m,
            ROUND(CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE)
              / COUNT(*), 6) AS msq
          FROM u GROUP BY pos),
        s2 AS (SELECT pos, m, msq - m * m AS var FROM st
          WHERE msq - m * m > 0),
        sc AS (SELECT u.vec_id,
            CAST(((u.x - s2.m) / sqrt(s2.var)) *
              ((u.x - s2.m) / sqrt(s2.var)) AS DECIMAL(28,12)) AS t
          FROM u JOIN s2 USING (pos))
        SELECT vec_id, ROUND(CAST(SUM(t) AS DOUBLE), 6) AS score
        FROM sc GROUP BY vec_id
        ORDER BY score DESC, vec_id ASC LIMIT 20""")))
}
