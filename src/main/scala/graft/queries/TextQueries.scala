package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.JavaHash

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` fixture: token counting (whitespace + regex
  * segmentation), quality scoring (stopword/vocabulary/length signals),
  * n-gram-heuristic language ID, and document fingerprinting (polynomial
  * rolling hash — the same 31-polynomial the CDC partitioner uses,
  * exposed as the native `JavaStringHash` codegen expression).
  *
  * All per-document: embarrassingly parallel, no shuffle, scales linearly
  * — the plan is scan → project → sort only.
  */
object TextQueries {

  private val stopwords = Seq(
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  private val stopList = stopwords.map(w => s"'$w'").mkString(", ")

  val defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------ token counts
    "txt_tokens" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .select(
            col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
              .cast("long").as("n_bpeish"),
            length(col("text")).cast("long").as("n_chars_actual"),
            (length(replace(col("text"), lit(" "), lit(""))).cast("double") /
              size(col("toks")).cast("double")).as("avg_token_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
        len(string_split(trim(text), ' ')) AS n_tokens,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpeish,
        CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
        CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE) / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS avg_token_len
        FROM documents ORDER BY doc_id""")),

    // --------------------------------------------------- quality scoring
    // ------------------------------------ sentence segmentation stats
    // Per-document sentence structure: terminator-split segmentation
    // ([.!?]+ runs), per-sentence word counts folded into totals and a
    // max — the signals sentence-level chunkers and readability scores
    // consume. Pure per-row array math (scan → project), exact integer
    // arithmetic throughout; mean = int/int in IEEE double (exact
    // division, bit-identical cross-engine).
    "txt_sentences" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), expr(
            "filter(transform(split(text, '[.!?]+'), x -> trim(x)), x -> x != '')")
            .as("sents"))
          .select(col("doc_id"),
            size(col("sents")).cast("long").as("n_sentences"),
            expr("aggregate(sents, 0L, (a, x) -> a + size(split(x, ' +')))")
              .as("n_words"),
            expr("aggregate(sents, 0L, (a, x) -> greatest(a, CAST(size(split(x, ' +')) AS BIGINT)))")
              .as("max_sentence_words"))
          .withColumn("mean_sentence_words",
            when(col("n_sentences") > 0,
              col("n_words").cast("double") / col("n_sentences"))
              .otherwise(lit(0.0)))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id, list_filter(list_transform(
            string_split_regex(text, '[.!?]+'), x -> trim(x)),
            x -> x != '') AS sents
          FROM documents),
        m AS (SELECT doc_id,
            CAST(len(sents) AS BIGINT) AS n_sentences,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(sents,
                x -> CAST(len(string_split_regex(x, ' +')) AS BIGINT))),
              (a, b) -> a + b) AS BIGINT) AS n_words,
            CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(sents,
                x -> CAST(len(string_split_regex(x, ' +')) AS BIGINT))),
              (a, b) -> greatest(a, b)) AS BIGINT) AS max_sentence_words
          FROM d)
        SELECT doc_id, n_sentences, n_words, max_sentence_words,
          CASE WHEN n_sentences > 0
            THEN CAST(n_words AS DOUBLE) / n_sentences
            ELSE 0.0 END AS mean_sentence_words
        FROM m ORDER BY doc_id""")),

    "txt_quality" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .withColumn("n_tokens", size(col("toks")).cast("double"))
          .withColumn("stop_cnt",
            expr(s"size(filter(toks, t -> t IN ($stopList)))").cast("double"))
          .withColumn("vocab_cnt", size(array_distinct(col("toks"))).cast("double"))
          .select(
            col("doc_id"),
            (col("stop_cnt") / col("n_tokens")).as("stop_ratio"),
            (col("vocab_cnt") / col("n_tokens")).as("vocab_ratio"),
            ((col("stop_cnt") / col("n_tokens")) * lit(0.4) +
              (col("vocab_cnt") / col("n_tokens")) * lit(0.4) +
              when(length(col("text")) >= 50, lit(1.0)).otherwise(lit(0.0)) * lit(0.2))
              .as("quality_score"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (
        SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
        m AS (SELECT doc_id, text,
          CAST(len(toks) AS DOUBLE) AS n_tokens,
          CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE) AS stop_cnt,
          CAST(len(list_distinct(toks)) AS DOUBLE) AS vocab_cnt
        FROM d)
        SELECT doc_id,
        stop_cnt / n_tokens AS stop_ratio,
        vocab_cnt / n_tokens AS vocab_ratio,
        (stop_cnt / n_tokens) * 0.4 + (vocab_cnt / n_tokens) * 0.4 +
          (CASE WHEN LENGTH(text) >= 50 THEN 1.0 ELSE 0.0 END) * 0.2 AS quality_score
        FROM m ORDER BY doc_id""")),

    // ------------------------------------------- language-ID (heuristic)
    "txt_langid" -> QueryDef(
      (s, dir) => {
        val enList = stopList
        val esList = Seq("el", "la", "de", "que", "los", "y")
          .map(w => s"'$w'").mkString(", ")
        Tables.documents(s, dir)
          .withColumn("toks", split(trim(col("text")), " "))
          .withColumn("en_hits", expr(s"size(filter(toks, t -> t IN ($enList)))"))
          .withColumn("es_hits", expr(s"size(filter(toks, t -> t IN ($esList)))"))
          .select(
            col("doc_id"), col("lang").as("claimed_lang"),
            col("en_hits"), col("es_hits"),
            when(col("en_hits") >= col("es_hits") && col("en_hits") >= 2, "en")
              .when(col("es_hits") > col("en_hits") && col("es_hits") >= 2, "es")
              .otherwise("unk").as("predicted_lang"))
          .orderBy(col("doc_id"))
      },
      Some({
        val enList = stopList
        val esList = Seq("el", "la", "de", "que", "los", "y")
          .map(w => s"'$w'").mkString(", ")
        s"""WITH d AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents),
        m AS (SELECT doc_id, lang,
          CAST(len(list_filter(toks, t -> t IN ($enList))) AS INTEGER) AS en_hits,
          CAST(len(list_filter(toks, t -> t IN ($esList))) AS INTEGER) AS es_hits
        FROM d)
        SELECT doc_id, lang AS claimed_lang, en_hits, es_hits,
        CASE WHEN en_hits >= es_hits AND en_hits >= 2 THEN 'en'
             WHEN es_hits > en_hits AND es_hits >= 2 THEN 'es'
             ELSE 'unk' END AS predicted_lang
        FROM m ORDER BY doc_id"""
      })),

    // ----------------------------------------- document fingerprinting
    "txt_fingerprint" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            JavaHash.javaStringHash(lower(trim(col("text")))).as("fingerprint"),
            JavaHash.javaStringHash(
              regexp_replace(lower(trim(col("text"))), "[^a-z0-9]+", " "))
              .as("fingerprint_norm"))
          .orderBy(col("doc_id"))
      },
      Some {
        def jh(e: String) =
          s"""(SELECT CASE WHEN h >= 2147483648 THEN CAST(h - 4294967296 AS INTEGER) ELSE CAST(h AS INTEGER) END
             | FROM (SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
             |   list_transform(range(1, LENGTH($e) + 1),
             |     i -> CAST(ord(SUBSTR($e, CAST(i AS INTEGER), 1)) AS BIGINT))),
             |   (a, b) -> (a * 31 + b) % 4294967296) AS h))""".stripMargin
        s"""SELECT doc_id,
        ${jh("lower(trim(text))")} AS fingerprint,
        ${jh("regexp_replace(lower(trim(text)), '[^a-z0-9]+', ' ', 'g')")} AS fingerprint_norm
        FROM documents ORDER BY doc_id"""
      }),

    // ------------------------------- vocabulary-lookup tokenization
    // The id-mapping step of a tokenizer: build a frequency-ranked
    // vocabulary (top-256 tokens, ties broken lexicographically, ids
    // 1..256; OOV → 0) and encode every document as its id sequence.
    // The encoded sequence is verified exactly via a 31-polynomial fold
    // over the ids in position order (`ids_hash`) — scalar output, but
    // any sequence difference changes the hash.
    //
    // Scale: the vocabulary is a keyed count (map-side partial) whose
    // top-k is a TakeOrdered (no global sort materialization), then 256
    // rows BROADCAST to the encode join; per-doc reassembly is one
    // keyed aggregate. A real BPE vocab (50k rows) broadcasts just the
    // same.
    "txt_tokenize_vocab" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val VocabSize = 256
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(split(trim(col("text")), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("tok"))
        val vocab = toks.groupBy(col("tok"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc).limit(VocabSize)
          .withColumn("tid", row_number()
            .over(Tables.tinyGlobalWindow(col("cnt").desc, col("tok").asc))
            .cast("long"))
          .select(col("tok"), col("tid"))
        toks.join(broadcast(vocab), Seq("tok"), "left")
          .withColumn("tid", coalesce(col("tid"), lit(0L)))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
            array_sort(collect_list(struct(col("pos"), col("tid"))))
              .as("pt"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            expr("""aggregate(transform(pt, x -> x.tid),
                CAST(0 AS BIGINT),
                (acc, t) -> (acc * 31 + t) % 4294967296)""").as("ids_hash"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents),
        t AS (SELECT doc_id,
          unnest(range(1, len(toks) + 1)) AS p, unnest(toks) AS tok
          FROM d),
        v AS (SELECT tok,
            ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS tid
          FROM t GROUP BY tok QUALIFY tid <= 256),
        enc AS (SELECT t.doc_id, t.p, COALESCE(v.tid, 0) AS tid
          FROM t LEFT JOIN v USING (tok))
        SELECT doc_id, COUNT(*) AS n_tokens,
          CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list(tid ORDER BY p)),
            (a, b) -> (a * 31 + b) % 4294967296) AS ids_hash
        FROM enc GROUP BY doc_id ORDER BY doc_id""")))
}
