package graft

import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType}

import graft.config.CdcParams
import graft.operators.KafkaProjection
import graft.streaming.CdcPipeline

/** Contract test for the Kafka sink assembly. The sandbox ships no
  * kafka-clients / spark-sql-kafka jars, so `format("kafka")` can never
  * execute here — this spec pins everything Spark's Kafka writer
  * validates at startup (per its published sink contract) so a
  * misconfiguration fails in CI instead of at deploy:
  *
  *   - column contract: `value` required (binary/string), optional
  *     `key` (binary/string), `topic` (string, required when no topic
  *     option is set), `partition` (int)
  *   - writer config: format name, `kafka.bootstrap.servers`, the
  *     reference's producer hardening (acks=-1, 900 s transaction
  *     timeout, MySQLCDC2AWSMSK.scala:177-178), `kafka.`-prefixed
  *     pass-through props, checkpointLocation, processing-time trigger.
  */
class KafkaContractSpec extends SparkSpec {

  private val params = CdcParams(
    brokerList = "b-1:9092,b-2:9092",
    topic = "cdc_topic", topicPrefix = "flink_cdc_",
    checkpointDir = "/tmp/graft_kafka_ckpt", checkpointInterval = 30,
    kafkaProperties = Map("compression.type" -> "lz4"),
    tablePk = """[{"db":"test_db","table":"eve.*","primary_key":"event_id"}]""")

  /** Private-field reader for the classic DataStreamWriter internals. */
  private def field[T](obj: AnyRef, name: String): T = {
    val f = obj.getClass.getDeclaredFields
      .find(_.getName.endsWith(name))
      .getOrElse(fail(s"field $name not found on ${obj.getClass}"))
    f.setAccessible(true)
    f.get(obj).asInstanceOf[T]
  }

  test("projection satisfies the Kafka writer column contract") {
    val df = CdcPipeline.build(spark, sf, params, numPartitions = 12)
    val bySchema = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(bySchema("key") == BinaryType)
    assert(bySchema("value") == BinaryType)
    assert(bySchema("topic") == StringType)
    assert(bySchema("partition") == IntegerType)
    // no extra columns: the Kafka writer rejects unknown columns
    assert(df.columns.toSet == Set("key", "value", "topic", "partition"))
  }

  test("kafkaSink writer carries format, broker options, checkpoint, trigger") {
    val df = CdcPipeline.build(spark, sf, params, numPartitions = 12)
    val writer = CdcPipeline.kafkaSink(df, params)
    assert(field[String](writer, "source") == "kafka")
    val opts = field[Map[String, String]](writer, "extraOptions")
    assert(opts("kafka.bootstrap.servers") == "b-1:9092,b-2:9092")
    assert(opts("kafka.acks") == "-1")
    assert(opts("kafka.transaction.timeout.ms") == "900000")
    // kafka_properties pass-through gets the kafka. option prefix
    assert(opts("kafka.compression.type") == "lz4")
    assert(opts("checkpointLocation") == params.checkpointDir)
    val trigger = field[AnyRef](writer, "trigger")
    assert(trigger.toString.contains("30000")) // 30 s processing-time
  }

  test("producerOptions prefix every pass-through property") {
    val opts = KafkaProjection.producerOptions(
      "b:9092", Map("ssl.truststore.location" -> "/x", "linger.ms" -> "5"))
    assert(opts("kafka.ssl.truststore.location") == "/x")
    assert(opts("kafka.linger.ms") == "5")
    // no un-prefixed producer prop can leak through (Spark would ignore it)
    assert(opts.keys.forall(k =>
      k.startsWith("kafka.") || k == "checkpointLocation"))
  }
}
