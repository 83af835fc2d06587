package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 300× IVM-chain scale probe (r15 verdict item 6): the next notch for
  * the CDC → IVM pipeline — ~30 M events / ~27 M replica rows — run at
  * the STATE-PROPORTIONAL bucket count to confirm the steady floor
  * stays scheduler-bound (exchange count, not per-bucket volume — the
  * r13/r14 profiles' conclusion) when both the state and the bucket
  * count grow 3× past the 100× shape.
  *
  * Bucket sizing rule (recorded in SCALING.md): target ~35 k replica
  * rows per bucket — the shape the r14 A/B measured fastest (100×:
  * 9 M rows / 256 buckets). At 300×: 27 M rows / 35 k ≈ 768 buckets.
  * The chain runs its bulk epochs directly at 768 (the migration
  * path is proven end-to-end at 100× and in IvmMigrationSpec; this
  * probe isolates the steady-floor question).
  *
  * Writes `SCALE300_r{N}.json`; when args(1) names an existing 30×
  * artifact it is ALSO spliced in under the `"x300"` key.
  *
  * Not part of the driver contract; run manually per round:
  *   SPARK_DRIVER_MEM=32g sbt "runMain graft.Scale300 SCALE300_r16.json SCALE_r16.json"
  */
object Scale300 {

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SCALE300_r16.json")
    val injectInto = args.drop(1).headOption
    HostLoad.awaitQuiet(threshold = 8.0, maxWaitSec = 180, tag = "scale300")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/graft_scale300"
    val sf = "/root/testdata/sf0.1"

    // 300x events: same construction as the 100x build, 3x the clones
    val base = graft.queries.Tables.events(spark, sf)
    (0 until 300).map(i =>
      base.withColumn("event_id", col("event_id") + lit(i.toLong * 100000)))
      .reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    println(s"[scale] built 300x: $nEvents events")

    // ~27M replica rows / ~35k rows-per-bucket target => 768 buckets
    val IvmBuckets = 768
    val ivmRes = ScaleHarness.runIvmE2E(spark, dir, IvmBuckets)
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    if (!ivmRes.parityPass) failed += "cdc_ivm_e2e_300x"
    if (!ScaleGates.ivm100SteadyOk(ivmRes.steadyOverheadSec)) {
      failed += "ivm300_steady_overhead"
      System.err.println(f"[scale] GATE: 300x ivm steady overhead " +
        f"${ivmRes.steadyOverheadSec}%.2f s at $IvmBuckets buckets " +
        f"exceeds ${ScaleGates.Ivm100SteadyOverheadMaxSec} s")
    }

    val oldGenPeakMb = ScaleHarness.oldGenPeakOverallMb
    val heapMaxMb = Runtime.getRuntime.maxMemory >> 20
    println(s"[scale] 300x old-gen peak ${oldGenPeakMb}MB of ${heapMaxMb}MB")

    val json =
      s"""{"metric":"scale_smoke_300x","value":${math.round(ivmRes
          .steadyOverheadSec * 100) / 100.0},"unit":"sec","scale":"300x-sf0.1","built":{"events":$nEvents},"materializers":{"cdc_ivm_e2e":${ScaleHarness
          .ivmJson(ivmRes, IvmBuckets)}},"bucket_sizing":{"rows_per_bucket_target":35000,"buckets":$IvmBuckets,"replica_rows":${ivmRes.repGot}},"memory":{"heap_max_mb":$heapMaxMb,"old_gen_peak_mb":$oldGenPeakMb,"headroom_mb":${heapMaxMb - oldGenPeakMb}},"failed":${failed
          .map("\"" + _ + "\"").mkString("[", ",", "]")},"methodology":"300x IVM chain through the shared ScaleHarness.runIvmE2E (identical protocol code to the 30x/100x smokes): 4 bulk epochs + dim-ripple epochs 4-5 + facts-only steady epochs 6-9, bulk at the state-proportional bucket count (~35k replica rows/bucket => 768), parity restatements exact vs from-scratch batch answers, steady gated <= 3.5s (ScaleGates.Ivm100SteadyOverheadMaxSec)"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[scale] wrote $outPath")
    println(json)
    injectInto.map(java.nio.file.Paths.get(_)).foreach { p =>
      if (ScaleHarness.spliceJsonSection(p, "x300", json))
        println(s"[scale] spliced x300 section into $p")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
