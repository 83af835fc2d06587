package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming dead-letter routing: classify each payload and split one
  * micro-batch into a good-path sink and a quarantine sink, both
  * epoch-fenced — the operational wrapper every production CDC consumer
  * puts around its parser (batch twin: the `cdc_dlq` query).
  *
  * Design notes for scale:
  *   - classification is a per-row projection (no join, no shuffle) —
  *     the classifier rides the scan exactly like the batch query
  *     (PlanSpec pins that shape);
  *   - the split writes BOTH sides from ONE classified batch per epoch
  *     — the filter runs twice over the same in-memory batch plan, not
  *     two source scans;
  *   - both sides write `epoch=N` subdirectories through the
  *     [[ExactlyOnce.writeFenced]] ledger, so a replayed epoch is a
  *     no-op and a torn write is overwritten — the quarantine gets the
  *     same exactly-once treatment as the good path (lost dead letters
  *     are the bug you find six months later).
  */
object DlqRouter {

  /** Add `error_class` to a DataFrame with a string `payload` column:
    * `ok`, `malformed` (structurally truncated), or `missing_key` (valid
    * JSON without the configured key). Same predicates as `cdc_dlq`.
    */
  def classify(df: DataFrame, keyPath: String = "$.k"): DataFrame =
    df.withColumn("error_class",
      when(!col("payload").endsWith("}"), lit("malformed"))
        .when(get_json_object(col("payload"), keyPath).isNull,
          lit("missing_key"))
        .otherwise(lit("ok")))

  /** writeStream.foreachBatch body: classify, then fan the epoch out to
    * the good-path and quarantine parquet targets (each under its own
    * `epoch=N` subdirectory, fenced by one ledger marker per epoch).
    * Quarantined rows keep their error_class for triage.
    */
  def foreachBatchSplit(goodDir: String, dlqDir: String, ledgerPath: String,
      keyPath: String = "$.k")(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    ExactlyOnce.writeFenced(spark, ledgerPath, batchId) { () =>
      val classified = classify(batch, keyPath)
      classified.filter(col("error_class") === "ok")
        .drop("error_class")
        .write.mode("overwrite").parquet(s"$goodDir/epoch=$batchId")
      classified.filter(col("error_class") =!= "ok")
        .write.mode("overwrite").parquet(s"$dlqDir/epoch=$batchId")
    }
  }
}
