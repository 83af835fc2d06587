package graft.apps

import org.apache.spark.sql.SparkSession

import graft.config.CdcParams
import graft.operators.{CdcEnrichment, KafkaProjection}
import graft.sources.KafkaCdcSource
import graft.streaming.CdcPipeline

/** Entry-point mirrors of the reference's three mains
  * (MySQLCDC2AWSMSK.scala:36, emr/MySQLCDC2AWSMSK.scala:34,
  * MongoCDC2AWSMSK.scala:38), same CLI flag names (README.md:30-48):
  *
  * {{{
  * spark-submit --class graft.apps.MySQLCdcToKafka app.jar \
  *   -broker_list b:9092 -topic cdc -topic_prefix flink_cdc_ \
  *   -position initial -table_pk '[{"db":"d","table":"t","primary_key":"id"}]' \
  *   -checkpoint_dir s3://bucket/ckpt -checkpoint_interval 60 \
  *   -delivery_guarantee at_least_once -parallel 12
  * }}}
  *
  * Architecture note (SURVEY §2 #1): Spark has no binlog reader; the
  * deployment pairs a Debezium/Kafka-Connect connector (producing the
  * same envelopes the reference's embedded connector emits) with this
  * consumer — source topic in, enriched/routed topics out. The
  * `-position` modes select the consumer start offset; `initial` is the
  * JDBC-snapshot-then-stream handoff (graft.sources.JdbcSnapshot).
  */
object MySQLCdcToKafka {
  def main(args: Array[String]): Unit = {
    val params = CdcParams.fromArgs(args)
    val spark = SparkSession.builder()
      .appName("MySQL Snapshot + Binlog + Kafka")
      .config("spark.sql.shuffle.partitions", params.parallel.toString)
      .config("spark.sql.session.timeZone", params.serverTimeZone)
      .getOrCreate()
    CdcPipeline.configure(spark)
    implicit val s: SparkSession = spark
    import spark.implicits._
    val lines = KafkaCdcSource.readStream(spark, params,
      maxOffsetsPerTrigger = params.chunkSize.toLong * params.parallel)
      .as[String]
    val enriched = CdcEnrichment.enrichMySql(lines, params.tablePkConfig).toDF()
    val projected = KafkaProjection.project(
      enriched, params.topic, params.topicPrefix)
    CdcPipeline.kafkaSink(projected, params).start().awaitTermination()
  }
}

/** Mongo change-stream variant (reference MongoCDC2AWSMSK.scala:38):
  * same pipeline, Mongo envelope enrichment (ns.db/ns.coll,
  * documentKey-regex PK, no truncation, raw passthrough).
  */
object MongoCdcToKafka {
  def main(args: Array[String]): Unit = {
    val params = CdcParams.fromArgs(args)
    val spark = SparkSession.builder()
      .appName("Mongo ChangeStream + Kafka")
      .config("spark.sql.shuffle.partitions", params.parallel.toString)
      .config("spark.sql.session.timeZone", params.serverTimeZone)
      .getOrCreate()
    CdcPipeline.configure(spark)
    implicit val s: SparkSession = spark
    import spark.implicits._
    val lines = KafkaCdcSource.readStream(spark, params).as[String]
    val enriched = CdcEnrichment.enrichMongo(lines).toDF()
    val projected = KafkaProjection.project(
      enriched, params.topic, params.topicPrefix)
    CdcPipeline.kafkaSink(projected, params).start().awaitTermination()
  }
}

/** Local/file-replay variant — the whole pipeline against the parquet
  * fixtures with a console/memory sink; the in-repo runnable mirror of
  * the reference's commented-out local debug mode
  * (MySQLCDC2AWSMSK.scala:169).
  */
object ReplayCdcLocal {
  def main(args: Array[String]): Unit = {
    val params = CdcParams.fromArgs(args)
    val sfDir = args.sliding(2, 2).collectFirst {
      case Array("-sf_dir", v) => v }.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("CDC replay (local)")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = CdcPipeline.build(spark, sfDir,
      params.copy(topic = "cdc_topic", topicPrefix = "flink_cdc_",
        tablePk =
          """[{"db":"test_db","table":"eve.*","primary_key":"event_id"}]"""),
      numPartitions = 12)
    val q = CdcPipeline.memorySink(df, "cdc_out")
    q.processAllAvailable()
    val n = spark.sql("SELECT COUNT(*) FROM cdc_out").head().getLong(0)
    spark.sql("SELECT CAST(key AS STRING) k, topic, partition FROM cdc_out LIMIT 5").show(false)
    println(s"[replay] streamed rows=$n")
    q.stop()
    spark.stop()
  }
}
