package graft.queries

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treats payloads as opaque `binary` columns
  * with typed metadata, and runs decode / feature-extract / frame-sample
  * stages over them — the shape a training-data pipeline uses for
  * image/audio/video shards.
  *
  * The container has no media codecs, so the DECODE STEP IS A STUB: the
  * "payload" is the document text UTF-8-encoded to binary, and "features"
  * are deterministic byte-level statistics. Everything around the stub —
  * the binary column schema, metadata struct, per-row feature projection,
  * and the explode-based frame sampler — is real Spark plumbing that
  * would carry an actual `decode_jpeg`/`ffmpeg` kernel unchanged (swap
  * the feature expressions for a mapInPandas / JNI batch kernel; the
  * plan shape — scan → project → explode — is identical).
  */
object MultimodalQueries {

  val defs: Map[String, QueryDef] = Map(

    // ------------------- WebDataset-style shard manifest planning
    // Assigns samples to fixed-byte-budget shards (64 KiB here; 1 GiB
    // in production) in deterministic (source, doc_id) order: a sample
    // belongs to the shard where its payload STARTS (concat-and-cut,
    // the tar-shard rule). The running byte offset is a per-source
    // window — partitioned, so no global single-partition sort exists
    // at any corpus size — and the manifest is one keyed aggregate:
    // O(shards) output rows that downstream loaders read instead of
    // listing objects.
    "mm_shard_manifest" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ShardBytes = 65536L
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            length(encode(col("text"), "utf-8")).cast("long").as("bytes"))
          .withColumn("cum", sum(col("bytes")).over(w))
          .withColumn("shard_id",
            expr(s"(cum - bytes) div $ShardBytes"))
          .groupBy(col("source"), col("shard_id"))
          .agg(count(lit(1)).as("n_samples"),
            sum(col("bytes")).as("shard_bytes"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("source"), col("shard_id"))
      },
      Some("""WITH b AS (
          SELECT doc_id, source,
            CAST(octet_length(encode(text)) AS BIGINT) AS bytes
          FROM documents),
        c AS (SELECT doc_id, source, bytes,
            CAST(SUM(bytes) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
          FROM b),
        sh AS (SELECT source, (cum - bytes) // 65536 AS shard_id,
            bytes, doc_id
          FROM c)
        SELECT source, shard_id, COUNT(*) AS n_samples,
          CAST(SUM(bytes) AS BIGINT) AS shard_bytes,
          MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM sh GROUP BY source, shard_id
        ORDER BY source, shard_id""")),

    // --------------------------- binary payload + metadata + features
    "mm_features" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            encode(col("text"), "utf-8").as("payload"),
            struct(
              (col("n_chars") % 640).cast("int").as("width"),
              (col("n_chars") % 480).cast("int").as("height"),
              lit("fake/raw").as("format")).as("meta"))
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("meta.format").as("format"),
            // STUB decode: first/last byte stand in for decoded features
            ascii(substring(col("payload").cast("string"), 1, 1)).as("head_byte"),
            ascii(expr("substring(cast(payload as string), -1, 1)")).as("tail_byte"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(n_chars % 640 AS INTEGER) AS width,
        CAST(n_chars % 480 AS INTEGER) AS height,
        'fake/raw' AS format,
        CAST(ord(SUBSTR(text, 1, 1)) AS INTEGER) AS head_byte,
        CAST(ord(SUBSTR(text, LENGTH(text), 1)) AS INTEGER) AS tail_byte
        FROM documents ORDER BY doc_id""")),

    // -------------------- batched decode kernel (mapInPandas analog)
    // The mapPartitions/batch-kernel contract with the STUB decoder —
    // see graft.operators.MultimodalKernel. Oracle recomputes the stub's
    // byte statistics from the text (ASCII ⇒ ord == byte value).
    "mm_decode_kernel" -> QueryDef(
      (s, dir) => graft.operators.MultimodalKernel.features(s, dir),
      Some("""WITH b AS (
        SELECT doc_id, n_chars,
          octet_length(encode(text)) AS n,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, LENGTH(text) + 1),
              i -> CAST(ord(SUBSTR(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
            (a, x) -> a + x) AS bytesum
        FROM documents)
        SELECT doc_id,
          CAST(n AS BIGINT) AS n_bytes,
          CAST(least(n_chars % 640, 224) AS INTEGER) AS out_width,
          CAST(least(n_chars % 480, 224) AS INTEGER) AS out_height,
          CAST(bytesum AS DOUBLE) / n AS mean_byte,
          CAST((n + 31) // 32 AS INTEGER) AS frames
        FROM b ORDER BY doc_id""")),

    // ----------------------------------------- frame sampling (explode)
    "mm_framesample" -> QueryDef(
      (s, dir) => {
        val FrameBytes = 32
        val Stride = 4
        Tables.documents(s, dir)
          .select(col("doc_id"),
            encode(col("text"), "utf-8").as("payload"))
          .withColumn("n_frames",
            ceil(length(col("payload")).cast("double") / FrameBytes).cast("long"))
          .withColumn("frame_idx",
            explode(sequence(lit(0L), col("n_frames") - 1, lit(Stride.toLong))))
          .select(
            col("doc_id"), col("frame_idx"),
            (col("frame_idx") * FrameBytes).as("frame_off"),
            least(lit(FrameBytes.toLong),
              length(col("payload")) - col("frame_idx") * FrameBytes)
              .cast("long").as("frame_len"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH f AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes,
          CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 32) AS BIGINT) AS n_frames
        FROM documents)
        SELECT doc_id, unnest(range(0, n_frames, 4)) AS frame_idx,
          unnest(range(0, n_frames, 4)) * 32 AS frame_off,
          least(32, n_bytes - unnest(range(0, n_frames, 4)) * 32) AS frame_len
        FROM f ORDER BY doc_id, frame_idx""")),

    // ---------------------------- exact binary-payload deduplication
    // Content-hash dedup over the opaque binary column — the multimodal
    // twin of `dedup_exact` (image/audio corpora are rife with re-posted
    // byte-identical files). Grouping is on md5(payload), so the
    // exchange ships a 16-byte digest per row, never the payload: at
    // 100 TB the blobs stay columnar in the scan and only hashes move.
    // md5 (not xxhash64) because both engines expose the identical
    // RFC-1321 hex digest, making the digest itself oracle-checkable.
    "mm_dedup_payload" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"),
            encode(col("text"), "utf-8").as("payload"))
          .groupBy(md5(col("payload")).as("digest"))
          .agg(min(col("doc_id")).as("keeper_doc_id"),
            count(lit(1)).as("n_copies"),
            sum(length(col("payload")).cast("long")).as("total_bytes"))
          .select(col("digest"), col("keeper_doc_id"), col("n_copies"),
            col("total_bytes"))
          .orderBy(col("keeper_doc_id"))
      },
      Some("""SELECT md5(text) AS digest,
          MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies,
          CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents GROUP BY md5(text)
        ORDER BY keeper_doc_id""")))
}
