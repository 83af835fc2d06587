package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous near-duplicate detection over an unbounded document
  * stream — the online counterpart of the batch MinHash/LSH pipeline
  * (`DedupQueries`): a newly-ingested document is flagged the moment
  * it collides with any previously-seen document, without ever
  * rescanning the corpus.
  *
  * Design for an unbounded corpus:
  *  - The MinHash signature is computed PER ROW with array expressions
  *    (shingle → hash → min over each permutation) — no aggregation,
  *    so there is no shuffle and no watermark requirement before the
  *    stateful stage.
  *  - The only stateful operator is keyed on (band, band-signature):
  *    state per key is just the first claimant's doc id (16 bytes +
  *    key), so total state is O(distinct buckets), not O(documents ×
  *    signature width). With the RocksDB state-store provider
  *    (`CdcPipeline` wires it) state spills to disk; for truly
  *    unbounded streams swap NoTimeout for a processing-time timeout
  *    to age out cold buckets.
  *  - Duplicate events are emitted per matching band; a consumer
  *    wanting doc-level verdicts distinct-aggregates downstream (kept
  *    out of this operator so the query stays single-stateful-stage).
  */
object StreamingDedup {

  /** One exploded LSH band row for a document. */
  final case class BandRow(doc_id: Long, band: Int, sig: String)

  /** Emitted when `doc_id` lands in a bucket first claimed by `dup_of`. */
  final case class DupEvent(doc_id: Long, dup_of: Long, band: Int)

  // same LSH geometry as the batch operators (DedupQueries): 16
  // permutations in 4 bands of 4; universal-hash coefficients over a
  // prime > 2^32
  private val NumHashes = 16
  private val BandSize = 4
  private val NumBands = NumHashes / BandSize
  private val P = 4294967311L

  /** Per-row band signatures: (doc_id, band, sig) — pure expressions,
    * streamable with no shuffle. `docs` needs (doc_id: long,
    * text: string).
    */
  def bandRows(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), " ")
    val shingles = expr(
      "array_distinct(transform(sequence(1, greatest(size(toks) - 2, 1)), " +
        "i -> concat_ws(' ', element_at(toks, i), " +
        "element_at(toks, least(i + 1, size(toks))), " +
        "element_at(toks, least(i + 2, size(toks))))))")
    // mask to 32 bits so h * a + b stays well inside a long (ANSI mode
    // rejects the overflow a full-range 64-bit hash would hit)
    val hashes = expr("transform(shingles, s -> xxhash64(s) & 4294967295L)")
    val mins = (0 until NumHashes).map { i =>
      val a = 2L * i + 1
      val b = 7919L * i + 1
      expr(s"array_min(transform(hs, h -> pmod(h * $a + $b, ${P}L)))")
        .as(s"mh$i")
    }
    val bandSigs = (0 until NumBands).map { bnd =>
      concat_ws("-",
        (0 until BandSize).map(r => col(s"mh${bnd * BandSize + r}")): _*)
    }
    docs
      .withColumn("toks", toks)
      .withColumn("shingles", shingles)
      .withColumn("hs", hashes)
      .select(col("doc_id") +: mins: _*)
      .select(col("doc_id"), posexplode(array(bandSigs: _*)))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("sig"))
  }

  /** The streaming query body: first claimant of each (band, sig)
    * bucket is remembered; later arrivals emit a [[DupEvent]] against
    * it. Deterministic within a micro-batch (lowest doc_id claims).
    */
  def nearDupEvents(docs: DataFrame): Dataset[DupEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandRows(docs).as[BandRow]
      .groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState[Long, DupEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, _), rows, state: GroupState[Long]) =>
          val ids = rows.map(_.doc_id).toSeq.sorted
          val owner = state.getOption.getOrElse(ids.head)
          if (!state.exists) state.update(owner)
          ids.filter(_ != owner).map(DupEvent(_, owner, band)).iterator
      }
  }
}
