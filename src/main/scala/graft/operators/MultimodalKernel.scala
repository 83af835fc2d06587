package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batched decode kernel plumbing for multimodal (binary) columns — the
  * Scala analog of `mapInPandas`: rows flow through `mapPartitions` in
  * fixed-size batches, each batch handed to a pluggable kernel exactly
  * the way an image/audio decoder (JNI, FFI, a model runtime) consumes
  * them. The CONTRACT — schema in/out, batch shape, partition locality —
  * is the real, tested part; the decode itself is a clearly-marked STUB
  * because this container ships no media codecs.
  *
  * Swap [[stubDecode]] for a real kernel (e.g. JPEG decode + resize) and
  * nothing else changes: same operator, same plan shape
  * (scan → rebalance → MapPartitions → downstream), same batching.
  *
  * Scale notes: batches bound peak kernel memory (batchSize × payload);
  * `Tables.rebalance` upstream spreads single-row-group scans; the
  * kernel never crosses partitions, so this parallelizes linearly with
  * executors.
  */
object MultimodalKernel {

  /** Input contract: one payload row. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int, format: String)

  /** Output contract: decoded features per payload. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      out_width: Int, out_height: Int, mean_byte: Double, frames: Int)

  /** The decode kernel signature a real implementation must satisfy:
    * a whole batch in, a feature row per input out.
    */
  type DecodeKernel = Seq[MediaRow] => Seq[MediaFeatures]

  /** STUB decode — deterministic byte statistics standing in for a real
    * decoder (??? territory: a production build links an actual codec
    * here). Resize semantics: clamp to 224×224 preserving the smaller
    * dimension; frame sampling: one "frame" per 32-byte chunk.
    */
  val stubDecode: DecodeKernel = batch => batch.map { r =>
    val n = r.payload.length.toLong
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = n,
      out_width = math.min(r.width, 224),
      out_height = math.min(r.height, 224),
      mean_byte = if (n == 0) 0.0 else sum.toDouble / n,
      frames = ((n + 31) / 32).toInt)
  }

  /** documents → MediaRow dataset (payload = UTF-8 text bytes; metadata
    * derived as in mm_features).
    */
  def mediaRows(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.queries.Tables.rebalance(
      graft.queries.Tables.documents(spark, sfDir))
      .select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit("fake/raw").as("format"))
      .as[MediaRow]
  }

  /** The operator: batched kernel application over partitions. */
  def decodeFeatures(rows: Dataset[MediaRow],
      kernel: DecodeKernel = stubDecode,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => kernel(batch.toSeq))
    }
  }

  /** DataFrame form for the declared query surface. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(mediaRows(spark, sfDir)).toDF()
      .orderBy(col("doc_id"))
}
