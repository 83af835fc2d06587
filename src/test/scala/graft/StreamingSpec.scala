package graft

import org.apache.spark.sql.functions._

import graft.config.CdcParams
import graft.streaming.CdcPipeline

/** Streaming pipeline smoke (SURVEY §5): the identical transform chain
  * that passes the batch DuckDB oracle, run under readStream through a
  * memory sink — asserting row counts, per-key ordering prerequisites
  * (same key ⇒ same partition), topic routing, and delete/before-key
  * handling.
  */
class StreamingSpec extends SparkSpec {

  val params: CdcParams = CdcParams(
    topic = "cdc_topic", topicPrefix = "flink_cdc_",
    tablePk = """[{"db":"test_db","table":"eve.*","primary_key":"event_id","column_max_length":"event_type=6|props=8"}]""")

  test("stream == batch: same rows through memory sink") {
    val df = CdcPipeline.build(spark, sf, params, numPartitions = 12)
    val q = CdcPipeline.memorySink(df, "cdc_stream_out")
    try {
      q.processAllAvailable()
      val out = spark.table("cdc_stream_out")
        .select(col("key").cast("string").as("k"), col("topic"), col("partition"))
      assert(out.count() == 1000)
      // topic routing: prefix + lower(db)
      assert(out.select(col("topic")).distinct().collect()
        .map(_.getString(0)).toSeq == Seq("flink_cdc_test_db"))
      // batch equivalence on the same projection
      val batch = queries.CdcQueries.flagship(spark, sf)
        .select(col("key").cast("string").as("k"), col("topic"), col("partition"))
      assert(out.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(out).count() == 0)
      // per-key ordering prerequisite: one partition per key
      val multi = out.groupBy(col("k"))
        .agg(countDistinct(col("partition")).as("nparts"))
        .filter(col("nparts") > 1).count()
      assert(multi == 0)
    } finally q.stop()
  }

  test("mongo change-stream pipeline under streaming matches batch") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val lines = graft.sources.CdcReplay.mongoStream(spark, sf)
    val enriched = graft.operators.CdcEnrichment
      .enrichMongo(lines.as[String]).toDF()
    val q = enriched.writeStream.format("memory")
      .queryName("mongo_stream_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("mongo_stream_out")
      assert(out.count() == 1000)
      assert(out.filter(col("partitionKey").startsWith("test_db.events."))
        .count() == 1000)
      // raw line passthrough (no re-serialization, MongoCDC2AWSMSK.scala:97)
      assert(out.filter(col("value").startsWith("{\"_id\":\"evt_"))
        .count() == 1000)
    } finally q.stop()
  }

  test("stateful dedup: dropDuplicates on partition key under streaming") {
    import org.apache.spark.sql.streaming.Trigger
    val lines = graft.sources.CdcReplay.stream(spark, sf)
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val deduped = graft.operators.CdcEnrichment
      .enrichMySql(lines.as[String], params.tablePkConfig).toDF()
      .dropDuplicates("partitionKey")
    val q = deduped.writeStream.format("memory")
      .queryName("cdc_dedup_out").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000)
      val n = spark.table("cdc_dedup_out").count()
      // every event_id is a distinct key → dedup keeps all 1000
      assert(n == 1000)
      assert(spark.table("cdc_dedup_out")
        .select(col("partitionKey")).distinct().count() == n)
      // value-bytes tripwire: the streamed envelopes must be BYTE-identical
      // to the batch oracle surface — counts/key-prefix checks alone let a
      // 1000x timestamp-layout error through (round-5 verdict item 2)
      val batchValues = queries.CdcQueries.enriched(spark, sf).select(col("value"))
      val streamValues = spark.table("cdc_dedup_out").select(col("value"))
      assert(streamValues.exceptAll(batchValues).count() == 0)
      assert(batchValues.exceptAll(streamValues).count() == 0)
    } finally q.stop()
  }

  test("stateful dedup on the RocksDB state store (reference EMR parity)") {
    graft.streaming.CdcPipeline.configure(spark) // RocksDB provider
    try {
      implicit val s: org.apache.spark.sql.SparkSession = spark
      import spark.implicits._
      val lines = graft.sources.CdcReplay.stream(spark, sf)
      val deduped = graft.operators.CdcEnrichment
        .enrichMySql(lines.as[String], params.tablePkConfig).toDF()
        .dropDuplicates("partitionKey")
      val q = deduped.writeStream.format("memory")
        .queryName("rocksdb_out").outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("rocksdb_out").count() == 1000)
        assert(spark.conf
          .get("spark.sql.streaming.stateStore.providerClass")
          .contains("RocksDB"))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("bounded-state dedup: dropDuplicatesWithinWatermark") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val lines = graft.sources.CdcReplay.stream(spark, sf)
    val enriched = graft.operators.CdcEnrichment
      .enrichMySql(lines.as[String], params.tablePkConfig).toDF()
      .withColumn("event_ts",
        expr("timestamp_millis(cast(get_json_object(value, '$.ts_ms') as long))"))
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("partitionKey")
    val q = enriched.writeStream.format("memory")
      .queryName("ddww_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // all keys unique within the watermark horizon → all retained,
      // but state is BOUNDED by the watermark (prod-safe dedup)
      assert(spark.table("ddww_out").count() == 1000)
    } finally q.stop()
  }

  test("landing-zone directory replay: events split across part files " +
      "stream to the same enriched rows as the single-file fixture") {
    // a CDC landing zone: events.parquet as a DIRECTORY of part files
    // arriving over time — rawEventsStream's other branch
    val zone = java.nio.file.Files.createTempDirectory("graft_zone").toString
    queries.Tables.events(spark, sf).repartition(4)
      .write.parquet(s"$zone/events.parquet")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val lines = graft.sources.CdcReplay.stream(spark, zone).as[String]
    val enriched = graft.operators.CdcEnrichment
      .enrichMySql(lines, params.tablePkConfig).toDF()
    val q = enriched.writeStream.format("memory")
      .queryName("zone_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("zone_out").select(col("value"))
      val want = queries.CdcQueries.enriched(spark, sf).select(col("value"))
      assert(got.count() == 1000)
      assert(got.exceptAll(want).count() == 0)
      assert(want.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("stream started on an empty landing zone starts idle instead of " +
      "failing the schema peek") {
    val zone = java.nio.file.Files.createTempDirectory("graft_empty_zone").toString
    assert(new java.io.File(s"$zone/events.parquet").mkdirs())
    val lines = graft.sources.CdcReplay.stream(spark, zone)
    val q = lines.writeStream.format("memory")
      .queryName("empty_zone_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_zone_out").count() == 0)
    } finally q.stop()
  }

  test("empty-zone stream accepts files arriving in the assumed " +
      "micros layout and streams true timestamps") {
    val zone = java.nio.file.Files.createTempDirectory("graft_zone_ok").toString
    assert(new java.io.File(s"$zone/events.parquet").mkdirs())
    val events = graft.sources.CdcReplay.rawEventsStream(spark, zone)
    val q = events.writeStream.format("memory")
      .queryName("zone_ok_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("zone_ok_out").count() == 0)
      // the zone fills AFTER stream start, in the expected layout —
      // including a NULL ts row, which the layout tripwire must pass
      // through untouched (null is not evidence of a wrong layout)
      queries.Tables.events(spark, sf).limit(50)
        .withColumn("ts", when(col("event_id") === 1,
          lit(null).cast("timestamp_ntz")).otherwise(col("ts")))
        .write.mode("append").parquet(s"$zone/events.parquet")
      q.processAllAvailable()
      val got = spark.table("zone_ok_out")
      assert(got.count() == 50)
      assert(got.filter(col("ts").isNull).count() == 1)
      assert(got.agg(max(year(col("ts")))).head().getInt(0) < 2100)
    } finally q.stop()
  }

  test("empty-zone stream FAILS FAST when arriving files decode to the " +
      "nanos-as-long 1000x timestamp class instead of reading them wrong") {
    val zone = java.nio.file.Files.createTempDirectory("graft_zone_bad").toString
    assert(new java.io.File(s"$zone/events.parquet").mkdirs())
    val events = graft.sources.CdcReplay.rawEventsStream(spark, zone)
    val q = events.writeStream.format("memory")
      .queryName("zone_bad_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // a nanos-as-long file misread under the assumed micros schema
      // decodes 2020-era values to ~year 52000; synthesize exactly
      // that decode result
      spark.range(1).select(
        lit(1L).as("event_id"),
        expr("cast(timestamp_micros(1600000000000000000) as timestamp_ntz)")
          .as("ts"),
        lit(1L).as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
        .write.mode("append").parquet(s"$zone/events.parquet")
      val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msgs = Iterator.iterate(failure: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("nanos-as-long"),
        s"expected the layout tripwire, got: $msgs")
    } finally q.stop()
  }

  test("windowed aggregation with watermark over the events stream") {
    // watermarks require TIMESTAMP (not NTZ); value-preserving under the
    // session's UTC timezone
    val events = graft.sources.CdcReplay.rawEventsStream(spark, sf)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.format("memory")
      .queryName("cdc_win_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdc_win_out")
      assert(got.count() > 0)
      // total event count is preserved across windows
      assert(got.agg(sum(col("n"))).head().getLong(0) == 1000L)
    } finally q.stop()
  }
}
