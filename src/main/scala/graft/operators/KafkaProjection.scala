package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.JavaHash

/** Sink-side projection for Spark's Kafka writer (SURVEY §2 #7-#11).
  *
  * Spark's Kafka sink consumes `key`/`value` binary columns and a per-row
  * `topic` string column natively, so the reference's four sink-side
  * components collapse into one select:
  *
  *   - key serialization: `partitionKey` UTF-8 bytes
  *     (reference kafka/CDCKafkaKeySerializationSchema.scala:7-11)
  *   - value serialization: enriched JSON UTF-8 bytes
  *     (kafka/CDCKafkaValueSerializationSchema.scala:7-11)
  *   - topic selection: `topicPrefix + lower(db)` when a prefix is set
  *     (one topic per database), else the fixed topic; prefix wins
  *     (topicselector/FlinkCDCSimpleTopicSelector.scala:6-13, README.md:44)
  *   - partitioner: `abs(partitionKey.hashCode % numPartitions)`
  *     (partitioner/FlinkCDCSimplePartitioner.scala:9-16) — Kafka's default
  *     murmur2-on-key already gives same-key→same-partition ordering; the
  *     explicit `partition` column reproduces the reference's exact
  *     partition numbers when bit-parity matters.
  */
object KafkaProjection {

  /** Topic routing column. `topicPrefix` non-empty ⇒ prefix + lower(db). */
  def topicExpr(db: Column, topic: String, topicPrefix: String): Column =
    if (topicPrefix.nonEmpty) concat(lit(topicPrefix), lower(db))
    else lit(topic)

  /** Project enriched records (db, table, partitionKey, value) to the
    * Kafka writer shape: key/value binary + per-row topic. When
    * `numPartitions > 0`, adds the reference-parity `partition` column.
    */
  def project(
      enriched: DataFrame,
      topic: String,
      topicPrefix: String = "",
      numPartitions: Int = 0): DataFrame = {
    val base = enriched.select(
      col("partitionKey").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      topicExpr(col("db"), topic, topicPrefix).as("topic"))
    if (numPartitions > 0)
      base.withColumn("partition",
        JavaHash.partitionFor(col("key").cast("string"), numPartitions))
    else base
  }

  /** The reference's NON-simple partitioner
    * (`FlinkCDCPartitioner.scala:9-12`): the partition is the Java hash
    * of the `source.kafka_partition_key` field READ BACK OUT OF THE
    * RECORD JSON — for sources that inject an explicit routing key into
    * the envelope rather than relying on the enriched partitionKey.
    * Records without the field (the common case) fall back to the
    * simple partitioner so a mixed stream still routes completely.
    */
  def partitionBySourceKey(value: Column, fallbackKey: Column,
      numPartitions: Int): Column = {
    val kpk = get_json_object(value.cast("string"),
      "$.source.kafka_partition_key")
    JavaHash.partitionFor(coalesce(kpk, fallbackKey.cast("string")),
      numPartitions)
  }

  /** Producer options for the Kafka writer: at-least-once by default (the
    * reference README itself recommends it, README.md:33); `acks=-1` and a
    * 900 s transaction timeout mirror the hardcoded producer config
    * (MySQLCDC2AWSMSK.scala:177-178). Extra `kafka_properties` pass
    * through with the `kafka.` option prefix.
    */
  def producerOptions(
      brokerList: String,
      passThrough: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokerList,
      "kafka.acks" -> "-1",
      "kafka.transaction.timeout.ms" -> "900000") ++
      passThrough.map { case (k, v) => s"kafka.$k" -> v }
}
