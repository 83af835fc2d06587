package graft.model

import org.apache.spark.sql.types._

/** Enriched CDC record — the engine's sink-side element type.
  *
  * Mirrors the reference's `CDCKafkaModel(db, table, partitionKey, value)`
  * (reference: src/main/scala/com/aws/analytics/model/CDCModel.scala:4):
  * `value` is the (possibly mutated) Debezium JSON envelope, `partitionKey`
  * is `db.table.pk1.pk2…` (or `db.table.no_pk`).
  */
final case class CdcKafkaRecord(
    db: String,
    table: String,
    partitionKey: String,
    value: String)

/** Spark StructType schemas for the Debezium change-event envelopes the
  * reference consumes (see reference MySQLCDC2AWSMSK.scala:91 for the
  * embedded golden example, MongoCDC2AWSMSK.scala:95-96 for Mongo).
  *
  * `before` / `after` are *dynamic* row images — no fixed column schema
  * exists anywhere in the reference — so they are modeled as
  * `MapType(String, String)` for generic access, with the option to
  * re-parse `props`-style nested JSON per table where needed.
  */
object CdcEnvelope {

  /** Debezium `source` block for MySQL (reference MySQLCDC2AWSMSK.scala:91). */
  val mysqlSourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("sequence", StringType),
    StructField("table", StringType),
    StructField("server_id", LongType),
    StructField("gtid", StringType),
    StructField("file", StringType),
    StructField("pos", LongType),
    StructField("row", IntegerType),
    StructField("thread", LongType),
    StructField("query", StringType)))

  /** Full MySQL envelope: {before, after, source, op, ts_ms, transaction}.
    * op ∈ {c, u, d, r} (reference MySQLCDC2AWSMSK.scala:116-131 branches on
    * op=="d" to read keys from `before`).
    */
  val mysqlEnvelope: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", mysqlSourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("transaction", StringType)))

  /** MongoDB change-stream envelope (reference MongoCDC2AWSMSK.scala:95-96):
    * db/table come from ns.db / ns.coll, op from operationType, and the key
    * is regex-extracted from documentKey.
    */
  val mongoEnvelope: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("operationType", StringType),
    StructField("fullDocument", StringType),
    StructField("source", StructType(Seq(
      StructField("ts_ms", LongType),
      StructField("snapshot", StringType)))),
    StructField("ts_ms", LongType),
    StructField("ns", StructType(Seq(
      StructField("db", StringType),
      StructField("coll", StringType)))),
    StructField("to", StringType),
    StructField("documentKey", StringType),
    StructField("updateDescription", StringType),
    StructField("clusterTime", StringType),
    StructField("txnNumber", LongType),
    StructField("lsid", StringType)))
}
