package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The in-smoke bucket migration path of [[ScaleHarness.runIvmE2E]]:
  * bulk epochs at the small count, stop at the epoch-3 frontier,
  * rebucketState every standing state (replica, rollup, both join-view
  * roots' left/right/view), resume the SAME stream from its checkpoint
  * for the steady/ripple epochs at the new count — and the parity
  * restatements must still be exact against the from-scratch batch
  * answer over everything ingested. This is the sf0.001 twin of the
  * 100× smoke's gated migration (Scale100), so a protocol regression
  * fails in the suite, not mid-smoke.
  */
class IvmMigrationSpec extends SparkSpec {

  test("IVM e2e with a mid-stream 8->32 rebucket migration keeps exact " +
      "parity and records the migration") {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val dir = Files.createTempDirectory("graft_ivm_mig").toString
    // the harness reads $dir/events.parquet and builds all state under
    // $dir — stage the fixture's events there
    queries.Tables.events(spark, sf)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val res = ScaleHarness.runIvmE2E(spark, dir, 8, migrateTo = Some(32),
      migrationWaves = 4, parityGroups = 4)
    assert(res.migrationJson.nonEmpty, "migration was not recorded")
    assert(res.migrationOldGenPeakMb.exists(_ > 0),
      "migration-window old-gen peak was not measured")
    assert(res.replicaHashMatch,
      "bucket-group content-hash parity broke post-migration")
    assert(res.migrationJson.get.contains("\"to_buckets\":32"))
    assert(res.migrationJson.get.contains("\"states_migrated\":8"))
    assert(res.migrationJson.get.contains("\"waves\":4"))
    assert(res.parityPass,
      s"post-migration parity broke: replica ${res.repGot}/${res.repWant}, " +
        s"rollup parity ${res.rollupParity}, cascade " +
        s"${res.cascadeGot}/${res.cascadeWant}, ripple ${res.rippleNegRows}")
    assert(res.steadyOverheadSec > 0, "no steady epochs were measured")
    // the artifact row carries both bucket shapes
    val json = ScaleHarness.ivmJson(res, 8)
    assert(json.contains("\"buckets\":8"))
    assert(json.contains("\"buckets_steady\":32"))
    assert(json.contains("\"parity_groups\":4"))
    assert(json.contains("\"replica_hash_match\":true"))
    // the migrated dirs are pinned at the new count: a stale-count
    // advance must trip the pin, not silently mis-bucket
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val oneRow = graft.operators.CdcEnrichment.enrichMySql(
      graft.sources.CdcReplay.batch(spark, dir).limit(1)
        .select(col("value")).as[String],
      queries.CdcQueries.config).toDF()
    val e = intercept[RuntimeException] {
      graft.operators.CdcApply.materializerVersioned(
        spark, s"$dir/ivm_replica_rb", 8)(oneRow, 99L)
    }
    assert(e.getMessage.contains("bucketed 32 ways"), e.getMessage)
  }
}
