package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{QueryDef, Tables}

/** Micro-batch incremental benchmark decontamination — the streaming
  * twin of the batch `txt_decontaminate` query (round-4 verdict item
  * 8: the inverted-index family was the last batch-only heavyweight).
  *
  * Shape mirrors `dedup_incremental`: a STANDING index (the benchmark
  * suite's distinct eval-gram hashes — one benchmark, not a corpus, so
  * it broadcasts at any scale) built once, and each arriving
  * micro-batch of training docs is scrubbed against it with a
  * gram-explode + keyed join + per-doc aggregation. Nothing rescans
  * previously-ingested documents, no state is carried between
  * micro-batches (each doc arrives whole, so its gram aggregation
  * completes inside its batch) — the stateless-per-epoch shape that
  * makes the operator trivially exactly-once under batch-id fencing
  * (ExactlyOnce.writeFenced on the output dir).
  *
  * Used inside `writeStream.foreachBatch`:
  * {{{
  * docsStream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
  *   StreamingDecontaminate.contamination(batch, evalIndex)
  *     .write.mode("overwrite").parquet(s"$out/epoch=$id")
  * }
  * }}}
  */
object StreamingDecontaminate {

  /** Word-trigram hashes of a (doc_id, lang, text) frame — the SAME
    * fused codegen gram stage as the batch query
    * (`CurationQueries.txt_decontaminate`), so stream and batch land
    * identical gram keys: hash over lang-prefixed trigram text.
    */
  private def gramRows(docs: DataFrame): DataFrame =
    docs
      .withColumn("ghs", graft.functions.WordGramHashes.wordGramHashes(
        col("text"), 3, concat(col("lang"), lit("|"))))
      .select(col("doc_id"), explode(col("ghs")).as("gh"))

  /** The standing benchmark index: distinct gram hashes of the eval
    * split (the same deterministic ~5% designation the batch query
    * uses: uhash(doc_id) % 20 == 1). Build once, reuse across every
    * micro-batch; at real scale persist + broadcast it.
    */
  def evalIndex(spark: SparkSession, dir: String): DataFrame =
    gramRows(Tables.documents(spark, dir)
      .filter(QueryDef.uhash(concat(lit("doc_"), col("doc_id"))) % 20 === 1))
      .select(col("gh")).distinct()

  /** Scrub one micro-batch of training docs (doc_id, lang, text)
    * against the standing index: per doc, the count of distinct grams
    * shared with the benchmark — identical semantics to the batch
    * query's per-doc output, computed incrementally. Docs sharing no
    * gram are absent (inner join), matching the batch contract.
    */
  def contamination(batch: DataFrame, evalIndex: DataFrame): DataFrame =
    gramRows(batch)
      .join(broadcast(evalIndex), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared_grams"))
}
