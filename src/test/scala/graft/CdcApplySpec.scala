package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.CdcApply

/** CDC apply semantics: upserts keep the latest after-image, deletes
  * remove the key, replays are idempotent, and the streaming
  * materializer converges to the same replica as a single batch apply.
  */
class CdcApplySpec extends SparkSpec {

  private def enrichedBatch = queries.CdcQueries.enriched(spark, sf)

  test("batch apply: deletes removed, upserts keep latest image") {
    val empty = CdcApply.lastChangePerKey(enrichedBatch.limit(0)).drop("op")
    val state = CdcApply.applyBatch(empty, enrichedBatch)
    // 1000 events → 100 deletes (event_id%10==0) → 900 live keys
    assert(state.count() == 900)
    assert(state.filter(col("partitionKey").endsWith(".no_pk")).count() == 0)
    // a deleted key (event_id 0,10,...) is absent
    assert(state.filter(col("partitionKey") === "test_db.events.0").count() == 0)
    // an updated key (event_id 1 → op u) carries its after image
    val u = state.filter(col("partitionKey") === "test_db.events.1")
      .select(col("after").getItem("event_id")).head().getString(0)
    assert(u == "1")
  }

  test("replaying the same batch is idempotent") {
    val empty = CdcApply.lastChangePerKey(enrichedBatch.limit(0)).drop("op")
    val once = CdcApply.applyBatch(empty, enrichedBatch)
    val twice = CdcApply.applyBatch(once, enrichedBatch)
    assert(twice.count() == once.count())
    assert(twice.select(col("partitionKey"))
      .exceptAll(once.select(col("partitionKey"))).count() == 0)
  }

  test("streaming materializer converges to the batch replica") {
    val stateDir = Files.createTempDirectory("graft_apply").toString
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val lines = graft.sources.CdcReplay.stream(spark, sf).as[String]
    // same enrichment config as the batch cdc_apply_replica surface
    // (truncation rules included), so full row parity is checkable
    val enriched = graft.operators.CdcEnrichment
      .enrichMySql(lines, queries.CdcQueries.config).toDF()
    val q = enriched.writeStream
      .foreachBatch(CdcApply.materializer(spark, stateDir) _)
      .start()
    try q.processAllAvailable() finally q.stop()
    val replica = CdcApply.replica(spark, stateDir)
    assert(replica.count() == 900)
    assert(replica.select(col("partitionKey")).distinct().count() == 900)
    // full row parity with the declared batch surface, not just counts
    val got = replica.select(
      col("after").getItem("event_id").cast("long").as("event_id"),
      col("partitionKey").as("partition_key"),
      col("after").getItem("event_type").as("event_type_trunc"),
      col("after").getItem("value").as("value_str"))
    val want = SparkEntry.queries("cdc_apply_replica")(spark, sf)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }
}
