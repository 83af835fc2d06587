package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Randomized equivalence of the FUSED single-exchange advances
  * (`advancePre`: merge grouped on (__bucket, key) over a
  * __bucket-repartitioned input) against the generic two-exchange
  * path. `clusterByBucket = Some(false)` disables the clustering
  * exchange, which also routes around `advancePre` — so the same
  * epochs fold through both code paths into two state dirs and the
  * final states must match row-for-row. Batches include out-of-order
  * versions, deletes, retractions, and within-batch duplicates.
  */
class FusedAdvanceSpec extends SparkSpec {

  /** Forked session with the clustering exchange disabled — the lever
    * that routes advances down the generic (non-fused) path.
    */
  private lazy val genericSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.state.clusterByBucket", "false")
    s
  }

  private def env(key: String, eid: Long, et: String, v: Long,
      tsMs: Long, pos: Long, op: String): (String, String) = {
    val before =
      if (op == "d" || op == "u")
        s""""before":{"event_id":"$eid","event_type":"$et","value":"${v - 1}"},"""
      else ""
    (key,
      s"""{"after":${if (op == "d") "null"
        else s"""{"event_id":"$eid","event_type":"$et","value":"$v"}"""},
         |$before"source":{"ts_ms":$tsMs,"pos":$pos},"op":"$op","ts_ms":$tsMs}"""
        .stripMargin.replace("\n", ""))
  }

  test("fused versioned-replica advance == generic path over random " +
      "out-of-order epochs with deletes and ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val fusedDir = Files.createTempDirectory("graft_fused").toString
    val genDir = Files.createTempDirectory("graft_gen").toString
    val Buckets = 8
    (0L until 6L).foreach { epoch =>
      val rows = (0 until 40).map { i =>
        val k = rnd.nextInt(12)
        val op = rnd.nextInt(10) match {
          case 0 => "d"
          case n if n < 4 => "c"
          case _ => "u"
        }
        // deliberately coarse ts/pos so cross-epoch out-of-order and
        // some near-ties occur; pos keeps (ts, pos) unique per key
        env(s"db.t.$k", 1000L + k, s"et$k", rnd.nextInt(100),
          1000L + rnd.nextInt(8), epoch * 1000L + i, op)
      }
      val batch = rows.toDF("partitionKey", "value")
      graft.operators.CdcApply.materializerVersioned(
        spark, fusedDir, Buckets)(batch, epoch)
      // generic path: the conf disables the clustering exchange, which
      // also routes around advancePre — the plain window merge runs
      graft.operators.CdcApply.materializerVersioned(
        genericSession, genDir, Buckets)(batch, epoch)
    }
    def rowsOf(dir: String) = graft.operators.CdcApply
      .replicaVersioned(spark, dir)
      .orderBy(col("partitionKey"))
      .collect().map(_.toString).toSeq
    val fused = rowsOf(fusedDir)
    assert(fused.nonEmpty)
    assert(fused == rowsOf(genDir),
      "fused and generic replica states diverged")
  }

  test("fused signed-rollup advance == generic path over random " +
      "retraction epochs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val fusedDir = Files.createTempDirectory("graft_fusedr").toString
    val genDir = Files.createTempDirectory("graft_genr").toString
    (0L until 6L).foreach { epoch =>
      val rows = (0 until 60).map { _ =>
        (s"g${rnd.nextInt(6)}", rnd.nextInt(50).toLong,
          if (rnd.nextInt(4) == 0) -1L else 1L)
      }
      val batch = rows.toDF("g", "v", "sign")
      graft.streaming.StreamingRollup.materializerSigned(
        spark, fusedDir, Seq("g"), Seq("v_sum" -> "v"), "sign", 8)(
        batch, epoch)
      graft.streaming.StreamingRollup.materializerSigned(
        genericSession, genDir, Seq("g"), Seq("v_sum" -> "v"), "sign", 8)(
        batch, epoch)
    }
    def rowsOf(dir: String) = graft.streaming.StreamingRollup
      .rollup(spark, dir, Seq("g"))
      .orderBy(col("g")).collect().map(_.toString).toSeq
    val fused = rowsOf(fusedDir)
    assert(fused.nonEmpty)
    assert(fused == rowsOf(genDir),
      "fused and generic rollup states diverged")
  }

  test("fused join-view advances (side compaction + signed view merge) " +
      "== generic path over random signed epochs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    val fusedRoot = Files.createTempDirectory("graft_fusedjv").toString
    val genRoot = Files.createTempDirectory("graft_genjv").toString
    (0L until 5L).foreach { epoch =>
      // both feeds signed: ~1/4 retractions, duplicate keys within a
      // batch, and key ranges that only partially overlap so every
      // Δ×state arm (match, no-match, retract-to-zero, negative dip)
      // gets exercised on both sessions
      val lRows = (0 until 30).map { _ =>
        (rnd.nextInt(10).toLong, rnd.nextInt(50).toLong,
          if (rnd.nextInt(4) == 0) -1L else 1L)
      }
      val rRows = (0 until 30).map { _ =>
        (4L + rnd.nextInt(10), rnd.nextInt(50).toLong,
          if (rnd.nextInt(4) == 0) -1L else 1L)
      }
      val lb = lRows.toDF("lk", "lv", "sign")
      val rb = rRows.toDF("rk", "rv", "sign")
      graft.streaming.StreamingJoinView.materializerSigned(
        spark, fusedRoot, Seq("lk"), Seq("rk"),
        Some("sign"), Some("sign"), 8)(lb, rb, epoch)
      graft.streaming.StreamingJoinView.materializerSigned(
        genericSession, genRoot, Seq("lk"), Seq("rk"),
        Some("sign"), Some("sign"), 8)(lb, rb, epoch)
    }
    def rowsOf(root: String) = graft.streaming.StreamingJoinView
      .view(spark, root)
      .collect().map(_.toString).sorted.toSeq
    val fused = rowsOf(fusedRoot)
    assert(fused.nonEmpty)
    assert(fused == rowsOf(genRoot),
      "fused and generic join-view states diverged")
  }
}
