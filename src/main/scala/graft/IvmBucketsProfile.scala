package graft

import org.apache.spark.sql.SparkSession

/** Bucket-count lever A/B for the CDC→IVM chain at large state
  * (round-14 follow-up to the 100× smoke's one honest scaling
  * observation): the steady-epoch floor grew 2.87 → 6.95 s from 30×
  * to 100× while rows/bytes written stayed O(touched) — because a
  * "touched bucket" advance reads and rewrites the touched buckets'
  * FULL slices, and slice size grows with standing state when the
  * bucket count is fixed. The deployment-shape answer is to size
  * `numBuckets` to the state (the same slice bytes per bucket at any
  * scale), exactly like sizing shuffle partitions; this main measures
  * that lever by running the IDENTICAL 100× IVM harness
  * ([[ScaleHarness.runIvmE2E]]) at a configurable bucket count over
  * the corpus the 100× smoke built.
  *
  *   sbt "runMain graft.IvmBucketsProfile /tmp/graft_scale100 64"
  *   sbt "runMain graft.IvmBucketsProfile /tmp/graft_scale100 256"
  *   sbt "runMain graft.IvmBucketsProfile /tmp/graft_scale100 64 256"  # with mid-run migration
  *
  * Emits one JSON line per run; findings land in IVM_PROFILE_r14.md.
  */
object IvmBucketsProfile {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val migrateTo = args.lift(2).map(_.toInt)
    HostLoad.awaitQuiet(threshold = 8.0, maxWaitSec = 180, tag = "ivmab")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = ScaleHarness.runIvmE2E(spark, dir, buckets, migrateTo)
    val json = s"""{"metric":"ivm_buckets_ab","dir":"$dir","buckets":$buckets,""" +
      s""""steady_overhead_sec":${math.round(res.steadyOverheadSec * 1000) / 1000.0},""" +
      s""""ripple_epoch_sec_max":${math.round(res.rippleSecMax * 1000) / 1000.0},""" +
      s""""parity_pass":${res.parityPass},""" +
      res.migrationJson.map(m => s""""migration":$m,""").getOrElse("") +
      s""""epochs":${res.epochsJson.mkString("[", ",", "]")}}"""
    println(json)
    spark.stop()
    if (!res.parityPass) sys.exit(1)
  }
}
