package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.ScdApply

/** Streaming SCD2 twin (round-5 verdict item 7): the incremental
  * foreachBatch MERGE converges to the exact batch `cdc_scd2_history`
  * surface after an event-time-ordered replay, and the epoch ledger
  * fences replayed batches.
  */
class ScdApplySpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
      r.getAs[Int]("version"), r.getAs[Long]("valid_from"),
      Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue),
      r.getAs[Boolean]("is_current")))
    .sortBy(t => (t._1, t._3))
    .toSeq

  test("streaming SCD2 materializer matches batch cdc_scd2_history " +
      "bit-for-bit after ordered replay") {
    val truth = rows(SparkEntry.queries("cdc_scd2_history")(spark, sf))

    // the ordered feed: every (sec, event_id) sorts after all
    // already-applied changes — the contract advance() requires
    val changes = queries.Tables.events(spark, sf)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(col("user_id"), col("event_id"), col("sec"))
      .orderBy(col("sec"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val stateDir = Files.createTempDirectory("graft_scd2").toString
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val q = in.toDS().toDF("user_id", "event_id", "sec")
      .writeStream
      .foreachBatch(ScdApply.materializer(spark, stateDir) _)
      .start()
    try {
      changes.grouped((changes.size + 3) / 4).foreach { chunk =>
        in.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val got = rows(ScdApply.history(spark, stateDir))
    assert(got.size == truth.size,
      s"history has ${got.size} version rows, batch built ${truth.size}")
    assert(got == truth)

    // replaying an already-committed epoch is fenced to a no-op, even
    // with different (here: empty) batch content
    ScdApply.materializer(spark, stateDir)(
      ScdApply.emptyHistory(spark)
        .select(col("user_id"), col("event_id"), col("valid_from").as("sec")),
      0L)
    assert(rows(ScdApply.history(spark, stateDir)) == truth)
  }

  test("out-of-order epochs converge to the batch truth under a shuffled " +
      "replay, and re-delivered changes are no-ops") {
    val truth = rows(SparkEntry.queries("cdc_scd2_history")(spark, sf))
    import spark.implicits._
    // deterministic NON-chronological permutation: order by a hash of
    // the change id, so early and late changes interleave across epochs
    val changes = queries.Tables.events(spark, sf)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select(col("user_id"), col("event_id"), col("sec"))
      .orderBy(xxhash64(col("event_id")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    var history = graft.operators.ScdApply.emptyHistory(spark)
    changes.grouped((changes.size + 3) / 4).foreach { chunk =>
      val b = chunk.toDF("user_id", "event_id", "sec")
      history = graft.operators.ScdApply
        .advanceOutOfOrder(history, b).localCheckpoint()
    }
    assert(rows(history) == truth)

    // at-least-once: re-delivering an already-applied chunk is a no-op
    val replayed = graft.operators.ScdApply.advanceOutOfOrder(history,
      changes.take(100).toDF("user_id", "event_id", "sec"))
    assert(rows(replayed) == truth)
  }

  test("a crash between state write and marker commit never loses the " +
      "previously committed history") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft_scd2_crash").toString
    val b0 = Seq((7L, 100L, 10L)).toDF("user_id", "event_id", "sec")
    ScdApply.materializer(spark, stateDir)(b0, 0L)
    val committed = rows(ScdApply.history(spark, stateDir))

    // simulate the torn epoch 1: state written, crash BEFORE the marker
    val b1 = Seq((7L, 101L, 20L)).toDF("user_id", "event_id", "sec")
    ScdApply.advance(ScdApply.history(spark, stateDir), b1)
      .write.parquet(s"$stateDir/state-1")
    // the reader still resolves epoch 0 — the orphan is invisible
    assert(rows(ScdApply.history(spark, stateDir)) == committed)

    // the replayed epoch overwrites the orphan and commits atomically
    ScdApply.materializer(spark, stateDir)(b1, 1L)
    assert(rows(ScdApply.history(spark, stateDir)) == Seq(
      (7L, 100L, 1, 10L, Some(20L), false),
      (7L, 101L, 2, 20L, None, true)))
    // epoch 0's state was retired only after epoch 1 committed
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/state-0")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$stateDir/state-1")))
  }

  test("advance assigns versions incrementally across epochs") {
    import spark.implicits._
    val h0 = ScdApply.emptyHistory(spark)
    val b1 = Seq((7L, 100L, 10L), (7L, 101L, 20L), (9L, 200L, 15L))
      .toDF("user_id", "event_id", "sec")
    val h1 = ScdApply.advance(h0, b1)
    // user 7 has versions 1 (closed at 20) and 2 (current); user 9 has 1
    assert(rows(h1) == Seq(
      (7L, 100L, 1, 10L, Some(20L), false),
      (7L, 101L, 2, 20L, None, true),
      (9L, 200L, 1, 15L, None, true)))
    val b2 = Seq((7L, 102L, 30L)).toDF("user_id", "event_id", "sec")
    val h2 = ScdApply.advance(h1, b2)
    // the new change closes user 7's current row and becomes version 3;
    // user 9 is untouched
    assert(rows(h2) == Seq(
      (7L, 100L, 1, 10L, Some(20L), false),
      (7L, 101L, 2, 20L, Some(30L), false),
      (7L, 102L, 3, 30L, None, true),
      (9L, 200L, 1, 15L, None, true)))
  }
}
