package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply — materializes the enriched change stream into a replica
  * table, the job the reference's downstream consumers perform (its
  * README pairs the MSK topic with Hudi/Iceberg/"apply to lake"
  * consumers). Semantics per primary key, in change order:
  *
  *   - `c` / `u` / `r` → upsert the `after` image
  *   - `d` → remove the key
  *
  * Change order within a key is (source.ts_ms, source.pos) — the binlog
  * order the reference preserves by keying Kafka on partitionKey; the
  * apply picks each key's LAST change, so replaying duplicates (the
  * at-least-once case) or re-running a batch is idempotent — this is
  * where the per-key ordering guarantee pays off.
  *
  * Scale notes: one shuffle on partitionKey for the last-change window;
  * the merge with existing state is a full-outer-style anti+union over
  * the key — on a real lake this is a MERGE INTO (Delta/Iceberg/Hudi);
  * the parquet swap here keeps the same logical shape with
  * penalty-free testability.
  */
object CdcApply {

  /** Latest change per key from a batch of enriched records (columns:
    * partitionKey, value = envelope JSON). Returns one row per key:
    * partitionKey, op, after (map), ts_ms, pos.
    */
  def lastChangePerKey(batch: DataFrame): DataFrame = {
    val env = batch.withColumn("env",
      from_json(col("value"), graft.model.CdcEnvelope.mysqlEnvelope))
    val w = Window.partitionBy(col("partitionKey"))
      .orderBy(col("env.source.ts_ms").desc, col("env.source.pos").desc)
    env.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(
        col("partitionKey"),
        col("env.op").as("op"),
        col("env.after").as("after"),
        col("env.source.ts_ms").as("ts_ms"),
        col("env.source.pos").as("pos"))
  }

  /** Apply a change batch to the current state (both keyed by
    * partitionKey): surviving state = old rows whose key saw no change,
    * plus the after-image of every non-delete last change.
    */
  def applyBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val changes = lastChangePerKey(batch)
    val untouched = state.join(
      changes.select(col("partitionKey")), Seq("partitionKey"), "left_anti")
    val upserts = changes.filter(col("op") =!= "d")
      .select(col("partitionKey"), col("after"), col("ts_ms"), col("pos"))
    untouched.unionByName(upserts)
  }

  /** The empty replica frame (schema derived from `batch`'s shape). */
  def emptyReplica(spark: SparkSession, batch: DataFrame): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      lastChangePerKey(batch.limit(0)).drop("op").schema)

  /** How many hash buckets the persisted replica is split across. Small
    * here (tests); a 100 TB replica would use thousands — per-epoch
    * write cost is O(touched buckets' rows), so more buckets = finer
    * pruning, bounded below by sane file sizes.
    */
  val DefaultBuckets = 16

  /** Streaming materializer: foreachBatch body maintaining the replica
    * at `stateDir` via [[ExactlyOnce.advanceStateBucketed]] — the state
    * is hash-bucketed on partitionKey and an epoch rewrites ONLY the
    * buckets its batch touches, committed under one epoch-ledger marker
    * (crash-safe, replays are no-ops). This is MERGE INTO with file
    * pruning on a real table format, kept testable as versioned
    * parquet. Read the replica with [[replica]]; reads resolving while
    * an epoch commits get a one-epoch grace window (retirement keeps
    * each bucket's previous version until the next epoch).
    */
  def materializer(spark: SparkSession, stateDir: String,
      numBuckets: Int = DefaultBuckets)(
      batch: DataFrame, batchId: Long): Unit = {
    ExactlyOnce.advanceStateBucketed(spark, stateDir, batchId, batch,
      "partitionKey", numBuckets)(
      emptyReplica(spark, batch))(current => applyBatch(current, batch))
    ()
  }

  /** The replica's fixed schema: partitionKey + the dynamic after-image
    * map + the change position that produced it.
    */
  val replicaSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("partitionKey", StringType),
      StructField("after", MapType(StringType, StringType)),
      StructField("ts_ms", LongType),
      StructField("pos", LongType)))
  }

  /** The newest committed replica state at `stateDir` (per bucket, the
    * newest committed epoch's version).
    */
  def replica(spark: SparkSession, stateDir: String): DataFrame = {
    require(ExactlyOnce.hasCommittedState(spark, stateDir),
      s"no committed replica state under $stateDir")
    ExactlyOnce.currentStateBucketed(spark, stateDir)(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], replicaSchema))
  }
}
