package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.{CdcApply, CdcDeltas}
import graft.streaming.StreamingRollup

/** Lookup changelog producer: retraction streams derived for feeds
  * with NO before-images by reading the replica's pre-epoch state —
  * a downstream signed rollup tracks the replica exactly, through
  * updates, deletes, re-inserts, and torn-epoch replays.
  */
class ChangelogLookupSpec extends SparkSpec {

  private def envelope(k: String, op: String, ts: Long, et: String,
      v: String): (String, String) =
    k -> s"""{"op":"$op","after":${
      if (op == "d") "null"
      else s"""{"k":"$k","et":"$et","v":"$v"}"""
    },"source":{"ts_ms":$ts,"pos":$ts}}"""

  private def batch(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("partitionKey", "value")
  }

  private def feedRollup(rollupDir: String)(
      deltas: DataFrame, id: Long): Unit =
    StreamingRollup.materializerSigned(spark, rollupDir, Seq("et"),
      Seq("v_sum" -> "v"), "sign")(
      deltas.select(col("image").getItem("et").as("et"),
        col("image").getItem("v").as("v"), col("sign")), id)

  private def rollupState(rollupDir: String): Map[String, (Long, Double)] =
    StreamingRollup.rollup(spark, rollupDir, Seq("et"))
      .collect()
      .map(r => r.getAs[String]("et") -> (r.getAs[Long]("n"),
        BigDecimal(r.getAs[java.math.BigDecimal]("v_sum")).toDouble))
      .toMap

  /** The truth: aggregate the replica's CURRENT after-images. */
  private def replicaTruth(replicaDir: String): Map[String, (Long, Double)] =
    CdcApply.replica(spark, replicaDir)
      .select(element_at(col("after"), "et").as("et"),
        element_at(col("after"), "v").cast("decimal(18,2)").as("v"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private val e0 = Seq(envelope("u1", "c", 1, "A", "1"),
    envelope("u2", "c", 2, "A", "2"), envelope("u3", "c", 3, "B", "3"))
  private val e1 = Seq(envelope("u1", "u", 4, "B", "5"),
    envelope("u2", "d", 5, "", ""), envelope("u4", "c", 6, "A", "4"))
  private val e2 = Seq(envelope("u3", "u", 7, "B", "7"),
    envelope("u2", "c", 8, "A", "9"))

  test("a no-before-image feed keeps a downstream signed rollup " +
      "tracking the replica exactly through update/delete/re-insert") {
    val replicaDir = Files.createTempDirectory("graft_cl_rep").toString
    val rollupDir = Files.createTempDirectory("graft_cl_roll").toString
    val m = CdcApply.materializerWithChangelog(spark, replicaDir)(
      feedRollup(rollupDir)) _
    Seq(e0, e1, e2).zipWithIndex.foreach { case (rows, e) =>
      m(batch(rows), e.toLong)
      assert(rollupState(rollupDir) == replicaTruth(replicaDir),
        s"after epoch $e")
    }
    // concrete final check: u1→(B,5) u3→(B,7) u4→(A,4) u2→(A,9)
    assert(rollupState(rollupDir) ==
      Map("A" -> (2L, 13.0), "B" -> (2L, 12.0)))
  }

  test("delta shapes: first insert is bare +1, update is (-old,+new) " +
      "from the REPLICA's row, delete of an absent key is empty") {
    val replicaDir = Files.createTempDirectory("graft_cl_shape").toString
    CdcApply.materializer(spark, replicaDir)(batch(e0), 0L)

    def deltasFor(rows: Seq[(String, String)], id: Long) =
      CdcDeltas.lookupDeltas(spark, replicaDir, batch(rows), id)
        .select(element_at(col("image"), "k").as("k"),
          element_at(col("image"), "v").as("v"), col("sign"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getInt(2))).toSet

    // update u1 (replica holds v=1): retract old, insert new
    assert(deltasFor(Seq(envelope("u1", "u", 10, "B", "50")), 1L) ==
      Set(("u1", "1", -1), ("u1", "50", 1)))
    // first insert of a fresh key: only +1
    assert(deltasFor(Seq(envelope("u9", "c", 11, "A", "6")), 1L) ==
      Set(("u9", "6", 1)))
    // delete of an absent key: nothing to retract, nothing inserted
    assert(deltasFor(Seq(envelope("zz", "d", 12, "", "")), 1L).isEmpty)
  }

  test("mongo end-to-end: a real fullDocument feed (no before-images " +
      "by construction) through the mongo changelog materializer") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val replicaDir = Files.createTempDirectory("graft_cl_mongo").toString
    val rollupDir = Files.createTempDirectory("graft_cl_mongo_r").toString
    val envs = graft.sources.CdcReplay.mongoEnvelopeJson(
      queries.Tables.events(spark, sf), withFullDocument = true)
    val enrichedRecs = graft.operators.CdcEnrichment
      .enrichMongo(envs.as[String]).toDF()
      .withColumn("__id",
        regexp_extract(col("partitionKey"), "(\\d+)$", 1).cast("long"))

    def feedMongoRollup(deltas: DataFrame, id: Long): Unit =
      StreamingRollup.materializerSigned(spark, rollupDir,
        Seq("event_type"), Seq("v_sum" -> "v"), "sign")(
        deltas.select(
          element_at(col("image"), "event_type").as("event_type"),
          element_at(col("image"), "value").as("v"), col("sign")), id)

    val m = CdcApply.materializerWithChangelogMongo(spark, replicaDir)(
      feedMongoRollup) _
    (0 until 3).foreach { e =>
      m(enrichedRecs.filter(col("__id") % 3 === e).drop("__id"), e.toLong)
    }

    val got = StreamingRollup.rollup(spark, rollupDir, Seq("event_type"))
      .select(col("event_type"), col("n"),
        col("v_sum").cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = CdcApply.replica(spark, replicaDir)
      .select(element_at(col("after"), "event_type").as("et"),
        element_at(col("after"), "value").cast("decimal(18,2)").as("v"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
    // and the replica is exactly the non-delete fixture rows (deletes
    // target keys never inserted in this replay — they no-op)
    val nonDelete = queries.Tables.events(spark, sf)
      .filter(col("event_id") % 10 =!= 0).count()
    assert(CdcApply.replica(spark, replicaDir).count() == nonDelete)
  }

  test("the mongo changelog materializer runs under a REAL readStream " +
      "foreachBatch and converges to the same replica-tracking rollup") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val replicaDir = Files.createTempDirectory("graft_cl_ms").toString
    val rollupDir = Files.createTempDirectory("graft_cl_ms_r").toString

    def feedMongoRollup(deltas: DataFrame, id: Long): Unit =
      StreamingRollup.materializerSigned(spark, rollupDir,
        Seq("event_type"), Seq("v_sum" -> "v"), "sign")(
        deltas.select(
          element_at(col("image"), "event_type").as("event_type"),
          element_at(col("image"), "value").as("v"), col("sign")), id)

    val q = graft.sources.CdcReplay
      .mongoStream(spark, sf, withFullDocument = true)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val enrichedRecs = graft.operators.CdcEnrichment
          .enrichMongo(batch.select(col("value")).as[String]).toDF()
        CdcApply.materializerWithChangelogMongo(spark, replicaDir)(
          feedMongoRollup)(enrichedRecs, id)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()

    val got = StreamingRollup.rollup(spark, rollupDir, Seq("event_type"))
      .select(col("event_type"), col("n"),
        col("v_sum").cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = CdcApply.replica(spark, replicaDir)
      .select(element_at(col("after"), "event_type").as("et"),
        element_at(col("after"), "value").cast("decimal(18,2)").as("v"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("torn epoch: replica advance committed, crash before the " +
      "downstream consumed — the replay derives identical deltas") {
    val replicaDir = Files.createTempDirectory("graft_cl_torn").toString
    val rollupDir = Files.createTempDirectory("graft_cl_torn_r").toString
    val m = CdcApply.materializerWithChangelog(spark, replicaDir)(
      feedRollup(rollupDir)) _
    m(batch(e0), 0L)
    // crash window: epoch 1's replica advance commits, downstream never
    // ran — then the whole epoch replays
    CdcApply.materializer(spark, replicaDir)(batch(e1), 1L)
    m(batch(e1), 1L)
    assert(rollupState(rollupDir) == replicaTruth(replicaDir))
    // and a FULL re-delivery of the epoch is a no-op everywhere
    m(batch(e1), 1L)
    assert(rollupState(rollupDir) == replicaTruth(replicaDir))
  }

  // ---- mongo envelope hardening (round-7 ADVICE items 1 + 2) ----

  private def chain(t: Throwable): String = {
    val sw = new java.io.StringWriter
    t.printStackTrace(new java.io.PrintWriter(sw))
    sw.toString
  }

  test("mongo same-millisecond changes to one key resolve " +
      "deterministically by clusterTime, with realistic resume-token " +
      "_ids the numeric-tail regex cannot order") {
    import spark.implicits._
    def env(id: String, full: String, ts: Long, ct: String) = {
      val esc = full.replace("\"", "\\\"")
      s"""{"_id":"$id","operationType":"update","fullDocument":"$esc",""" +
        s""""ts_ms":$ts,"clusterTime":"$ct"}"""
    }
    // both _ids carry the SAME digit run (82...), so pos ties; ts_ms
    // ties too — only clusterTime orders them
    val rows = Seq(
      ("k1", env("82AB0000", "{\"v\": \"old\"}", 100L,
        "Timestamp(1700000001, 1)")),
      ("k1", env("82AB0000", "{\"v\": \"new\"}", 100L,
        "Timestamp(1700000001, 2)")))
    def winner(input: Seq[(String, String)]): String =
      CdcApply.lastChangePerKeyMongo(input.toDF("partitionKey", "value"))
        .collect() match {
          case Array(r) => r.getAs[Map[String, String]]("after")("v")
        }
    assert(winner(rows) == "new")
    assert(winner(rows.reverse) == "new") // arrival order is irrelevant

    // digit-boundary crossing: i=10 > i=9 numerically but "10" < "9"
    // lexicographically — a string compare of the rendered clusterTime
    // would deterministically pick the OLDER image here
    val boundary = Seq(
      ("k1", env("82AB0000", "{\"v\": \"old\"}", 100L,
        "Timestamp(1700000001, 9)")),
      ("k1", env("82AB0000", "{\"v\": \"new\"}", 100L,
        "Timestamp(1700000001, 10)")))
    assert(winner(boundary) == "new")
    assert(winner(boundary.reverse) == "new")
    // same crossing in the extended-JSON rendering, and on t itself
    val extJson = Seq(
      ("k1", env("82AB0000", "{\"v\": \"old\"}", 100L,
        "{\\\"t\\\":99,\\\"i\\\":1}")),
      ("k1", env("82AB0000", "{\"v\": \"new\"}", 100L,
        "{\\\"t\\\":100,\\\"i\\\":1}")))
    assert(winner(extJson) == "new")
    assert(winner(extJson.reverse) == "new")
  }

  test("a real hex resume-token _id yields a null pos — its leading " +
      "digit run injects no pseudo-order into the tiebreak chain") {
    import spark.implicits._
    // _id "82AB10" vs "9XY2": an UNANCHORED first-digit-run regex
    // would give pos 82 vs 9 and pick the first; anchored ^evt_(\d+)$
    // leaves pos null for both and clusterTime decides
    def env(id: String, v: String, ct: String) = {
      val esc = s"""{"v": "$v"}""".replace("\"", "\\\"")
      s"""{"_id":"$id","operationType":"update","fullDocument":"$esc",""" +
        s""""ts_ms":100,"clusterTime":"$ct"}"""
    }
    val rows = Seq(
      ("k1", env("82AB10", "loser", "Timestamp(1, 1)")),
      ("k1", env("9XY2", "winner", "Timestamp(1, 2)")))
    val out = CdcApply.lastChangePerKeyMongo(
      rows.toDF("partitionKey", "value")).collect()
    assert(out.head.getAs[Map[String, String]]("after")("v") == "winner")
    assert(out.head.isNullAt(out.head.fieldIndex("pos")))
  }

  test("a mongo non-delete change without fullDocument fails loudly " +
      "instead of upserting a null image") {
    import spark.implicits._
    val rows = Seq(("k1",
      """{"_id":"evt_1","operationType":"update","ts_ms":5}"""))
      .toDF("partitionKey", "value")
    val e = intercept[Throwable] {
      CdcApply.lastChangePerKeyMongo(rows).collect()
    }
    assert(chain(e).contains("fullDocument"), chain(e).take(500))
  }

  test("collection-level mongo operationTypes (drop/rename/invalidate) " +
      "are rejected, never mapped to an upsert") {
    import spark.implicits._
    Seq("drop", "rename", "invalidate").foreach { t =>
      val rows = Seq(("k1",
        s"""{"_id":"evt_1","operationType":"$t","ts_ms":5}"""))
        .toDF("partitionKey", "value")
      val e = intercept[Throwable] {
        CdcApply.lastChangePerKeyMongo(rows).collect()
      }
      assert(chain(e).contains("unsupported mongo operationType"),
        chain(e).take(500))
    }
  }
}
