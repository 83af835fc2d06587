package graft

import java.nio.file.Files

import graft.config.CdcParams
import graft.streaming.CdcPipeline

/** Static recorder shared between executor threads (local mode = same
  * JVM) standing in for a Kafka broker's transaction log: records become
  * visible (read_committed semantics) only on commitTransaction.
  */
object TxnRecorder {
  import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
  val committedRecords = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  val aborted = new AtomicInteger(0)
  val sent = new AtomicLong(0)
  /** Sends fail once this many records have gone through (crash fault). */
  val failAfter = new AtomicInteger(Int.MaxValue)
  def reset(): Unit = {
    committedRecords.clear(); aborted.set(0); sent.set(0)
    failAfter.set(Int.MaxValue)
  }
}

/** Mock transactional producer: buffers sends, publishes on commit —
  * the state machine kafka-clients' KafkaProducer implements.
  */
class RecordingProducer extends graft.operators.ExactlyOnce.TxnProducer {
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  override def beginTransaction(): Unit = buffer.clear()
  override def send(key: String, value: String): Unit = {
    if (TxnRecorder.sent.incrementAndGet() > TxnRecorder.failAfter.get())
      throw new RuntimeException("simulated broker failure mid-transaction")
    buffer += ((key, value))
  }
  override def commitTransaction(): Unit =
    buffer.foreach(TxnRecorder.committedRecords.add)
  override def abortTransaction(): Unit = {
    TxnRecorder.aborted.incrementAndGet(); buffer.clear()
  }
  override def close(): Unit = ()
}

/** Drives the exactly_once sink path end-to-end: the full CDC pipeline
  * through the fenced foreachBatch writer into a lake directory.
  */
class DeliverySpec extends SparkSpec {

  test("transactional producer fencing: crash mid-epoch replays, marker fences") {
    import graft.operators.ExactlyOnce
    val ledger = Files.createTempDirectory("graft_txn_ledger").toString
    TxnRecorder.reset()

    val batch = spark.range(0, 100).selectExpr(
      "CAST(id AS STRING) AS key", "CAST(id * 2 AS STRING) AS value")
      .coalesce(1) // one partition ⇒ one transaction per attempt

    // attempt 1 crashes mid-send: transaction aborted, NO epoch marker
    TxnRecorder.failAfter.set(10)
    intercept[Exception] {
      ExactlyOnce.foreachBatchTransactional(
        ledger, () => new RecordingProducer)(batch, 5L)
    }
    assert(TxnRecorder.aborted.get() == 1)
    assert(TxnRecorder.committedRecords.isEmpty)
    assert(!new java.io.File(s"$ledger/epoch-5").exists())

    // replay (same batchId): marker absent ⇒ the epoch re-runs in full
    TxnRecorder.failAfter.set(Int.MaxValue)
    ExactlyOnce.foreachBatchTransactional(
      ledger, () => new RecordingProducer)(batch, 5L)
    assert(TxnRecorder.committedRecords.size() == 100)
    assert(new java.io.File(s"$ledger/epoch-5").exists())

    // second replay: marker present ⇒ fenced no-op, nothing re-sent
    ExactlyOnce.foreachBatchTransactional(
      ledger, () => new RecordingProducer)(batch, 5L)
    assert(TxnRecorder.committedRecords.size() == 100)
  }

  test("exactly_once sink writes each epoch once into the fenced target") {
    val ckpt = Files.createTempDirectory("graft_eo_sink").toString
    val params = CdcParams(
      topic = "cdc_topic", topicPrefix = "flink_cdc_",
      deliveryGuarantee = "exactly_once",
      checkpointDir = ckpt, checkpointInterval = 1,
      tablePk = """[{"db":"test_db","table":"eve.*","primary_key":"event_id"}]""")
    val df = CdcPipeline.build(spark, sf, params, numPartitions = 12)
    val q = CdcPipeline.sink(df, params).start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$ckpt/out")
    assert(out.count() == 1000)
    // ledger has one marker per committed epoch
    val markers = new java.io.File(s"$ckpt/ledger").list()
      .count(_.startsWith("epoch-"))
    assert(markers >= 1)
  }
}
