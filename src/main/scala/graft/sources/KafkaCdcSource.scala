package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.{CdcParams, StartupPosition}

/** Streaming source of Debezium JSON change events from a Kafka topic
  * (the Spark-native deployment of SURVEY §2 #1/#3: a Debezium /
  * Kafka-Connect connector tails the database and lands envelopes on a
  * topic; this source consumes them).
  *
  * Startup-position modes (reference `-position`,
  * MySQLCDC2AWSMSK.scala:225-244) map onto Kafka source options via
  * [[StartupPosition.toKafkaOptions]]: initial→earliest, latest→latest,
  * timestamp:<ms>→startingTimestamp; binlog-file/GTID positions belong to
  * the connector config, not the consumer.
  *
  * Scale notes: one Spark input partition per Kafka partition;
  * `minPartitions` can oversubscribe; `maxOffsetsPerTrigger` is the
  * backpressure knob ≙ the reference's snapshot `chunk_size` OOM guard.
  */
object KafkaCdcSource {

  /** Debezium MySQL connector properties for the deployment that feeds
    * this source — where every reference CLI flag that has NO Kafka-
    * consumer analogue actually lands:
    *
    *   - `database.server.id`: the `-server_id` range, one id per
    *     parallel reader (reference MySQLCDC2AWSMSK.scala:268-270) —
    *     Debezium accepts the full `lo-hi` range string
    *   - `snapshot.mode` from `-position`: initial→`initial`,
    *     latest→`never`, binlog-file/GTID→`schema_only_recovery` (resume
    *     at an explicit position), timestamp has no Debezium analogue
    *     and is handled consumer-side via `startingTimestamp`
    *   - db/table include lists from `-db_list`/`-tb_list`.
    */
  def connectorConfig(params: CdcParams): Map[String, String] = {
    val snapshotMode = params.startupPosition match {
      case StartupPosition.Initial => "initial"
      case StartupPosition.Latest => "never"
      case StartupPosition.BinlogOffset(_, _) | StartupPosition.Gtid(_) =>
        "schema_only_recovery"
      case StartupPosition.Timestamp(_) => "initial" // consumer-side fence
    }
    val base = Map(
      "connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
      "database.hostname" -> params.host,
      "database.port" -> params.port.toString,
      "database.user" -> params.username,
      "database.password" -> params.password,
      "database.include.list" -> params.dbList,
      "table.include.list" -> params.tbList,
      "database.serverTimezone" -> params.serverTimeZone,
      "snapshot.mode" -> snapshotMode,
      "snapshot.fetch.size" -> params.chunkSize.toString,
      "tasks.max" -> params.parallel.toString)
    if (params.serverIds.isEmpty) base
    else {
      // validate the range covers the parallelism up front (one replica
      // id per reader) — serverIdFor throws with the actionable message
      params.serverIdFor(params.parallel - 1)
      base + ("database.server.id" -> params.serverId)
    }
  }

  def readStream(spark: SparkSession, params: CdcParams,
      maxOffsetsPerTrigger: Long = 0L): DataFrame = {
    var r = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", params.brokerList)
      .option("subscribe", params.topic)
      .option("failOnDataLoss", "false")
    StartupPosition.toKafkaOptions(params.startupPosition)
      .foreach { case (k, v) => r = r.option(k, v) }
    if (maxOffsetsPerTrigger > 0)
      r = r.option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)
    r.load().selectExpr("CAST(value AS STRING) AS value")
  }
}
