package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Debezium envelope stream → SIGNED RETRACTION DELTAS: the bridge
  * from the reference's CDC feed to the incremental-view-maintenance
  * operators ([[graft.streaming.StreamingRollup]].materializerSigned,
  * [[graft.streaming.StreamingJoinView]].materializerSigned). Standard
  * IVM change translation over the op codes the reference dispatches
  * on (flink-cdc-msk `MySQLCDC2AWSMSK.scala:116-131` — `d` reads the
  * `before` image, everything else `after`):
  *
  *   - `c` / `r` → (+1, after)           — insert / snapshot read
  *   - `d`       → (−1, before)          — delete retracts the row
  *   - `u`       → (−1, before), (+1, after) — update = retract + insert
  *
  * One row in, ≤ 2 rows out via a single `explode` over a computed
  * two-element array — no second scan of the feed, codegen all the
  * way. Downstream, `sum(sign)` per group IS the live row count and
  * `sum(sign × x)` the live sum; a view fed these deltas tracks the
  * replica's content exactly, which is what makes the rollup/join-view
  * retraction arms the lake-side continuation of the reference's
  * pipeline.
  */
object CdcDeltas {

  /** Enriched records (`value` = envelope JSON) → one delta row per
    * image: `image` (the dynamic row map), `sign` (±1), plus the
    * binlog position (`ts_ms`, `pos`) for consumers that order.
    */
  def signedDeltas(enriched: DataFrame): DataFrame = {
    val env = enriched.withColumn("env",
      from_json(col("value"), graft.model.CdcEnvelope.mysqlEnvelope))
    env.select(
        col("env.op").as("op"),
        col("env.before").as("before"),
        col("env.after").as("after"),
        col("env.source.ts_ms").as("ts_ms"),
        col("env.source.pos").as("pos"))
      .withColumn("delta", explode(
        when(col("op") === "d",
          array(struct(col("before").as("image"), lit(-1).as("sign"))))
          .when(col("op") === "u",
            array(struct(col("before").as("image"), lit(-1).as("sign")),
              struct(col("after").as("image"), lit(1).as("sign"))))
          .otherwise(
            array(struct(col("after").as("image"), lit(1).as("sign"))))))
      .select(col("delta.image").as("image"),
        col("delta.sign").as("sign"), col("ts_ms"), col("pos"))
  }

  /** LOOKUP changelog producer — retraction deltas for feeds that
    * carry NO before-images (the MongoDB `fullDocument` shape,
    * reference `MongoCDC2AWSMSK.scala:95-96`, where updates and
    * deletes arrive without the pre-image): the retraction is derived
    * by LOOKING UP the standing replica's pre-epoch row for each
    * touched key — the mechanism lake engines call a lookup changelog
    * producer. For each key's last change in the batch:
    *
    *   - replica held row R before this epoch → emit (−1, R);
    *   - the change is not a delete → emit (+1, new after-image);
    *
    * so an update retracts what the REPLICA held (not what the
    * envelope claims), a first insert emits only +1, and a delete of
    * an absent key emits nothing. The lookup reads ONLY the buckets
    * the batch touches ([[ExactlyOnce.stateBucketsBefore]]) and reads
    * them AS OF strictly-before the epoch — identical on a torn-epoch
    * replay whether or not the replica advance already committed,
    * which is what lets the caller sequence lookup → apply → feed
    * downstream without a cross-state transaction.
    */
  def lookupDeltas(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, batch: DataFrame, batchId: Long,
      numBuckets: Int = CdcApply.DefaultBuckets,
      retain: Int = 2): DataFrame =
    lookupCore(spark, stateDir, CdcApply.lastChangePerKey(batch),
      batchId, numBuckets, retain)

  /** [[lookupDeltas]] for MONGO change-stream batches — the feed the
    * lookup producer exists for (no before-images at all: see
    * [[CdcApply.lastChangePerKeyMongo]]).
    */
  def lookupDeltasMongo(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, batch: DataFrame, batchId: Long,
      numBuckets: Int = CdcApply.DefaultBuckets,
      retain: Int = 2): DataFrame =
    lookupCore(spark, stateDir, CdcApply.lastChangePerKeyMongo(batch),
      batchId, numBuckets, retain)

  /** Envelope-agnostic core: `changes` is any last-change-per-key
    * frame in [[CdcApply.lastChangePerKey]]'s shape.
    */
  private def lookupCore(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, changesIn: DataFrame, batchId: Long,
      numBuckets: Int, retain: Int): DataFrame = {
    val changes = changesIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = changes
        .select(ExactlyOnce.bucketOf("partitionKey", numBuckets).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      def emptyPre = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        changes.drop("op").schema)
      val pre =
        if (!ExactlyOnce.hasCommittedState(spark, stateDir) ||
          touched.isEmpty) emptyPre
        else ExactlyOnce.stateBucketsBefore(spark, stateDir, batchId,
          touched, retain, expectedBuckets = Some(numBuckets))(emptyPre)
      val retractions = pre.join(
          changes.select(col("partitionKey")), Seq("partitionKey"))
        .select(col("after").as("image"), lit(-1).as("sign"),
          col("ts_ms"), col("pos"))
      val insertions = changes.filter(col("op") =!= "d")
        .select(col("after").as("image"), lit(1).as("sign"),
          col("ts_ms"), col("pos"))
      // lazy on purpose: the frame stays valid for the rest of the
      // epoch (pre-epoch bucket versions survive until the NEXT epoch
      // commits) — consume it within the epoch, like the join-view
      // increment
      retractions.unionByName(insertions)
    } finally changes.unpersist()
  }
}
