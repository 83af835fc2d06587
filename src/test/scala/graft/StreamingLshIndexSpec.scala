package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.ExactlyOnce
import graft.streaming.{StreamingDedup, StreamingLshIndex}

/** Durable LSH index materializer: multi-epoch parity with an exact
  * test-side fold of the claim protocol, replay fencing, crash-debris
  * invisibility, and O(touched-shards) epoch writes.
  */
class StreamingLshIndexSpec extends SparkSpec {

  /** sf0.001 documents split into `n` deterministic chunks. */
  private def docChunks(n: Int): Seq[Seq[(Long, String)]] = {
    val docs = queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    docs.grouped((docs.size + n - 1) / n).toSeq
  }

  private def runEpochs(stateDir: String, eventsDir: String,
      chunks: Seq[Seq[(Long, String)]]): Unit = {
    import spark.implicits._
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      StreamingLshIndex.materializer(spark, stateDir, eventsDir)(
        chunk.toDF("doc_id", "text"), i.toLong)
    }
  }

  /** Exact expected (owners, events) fold: batch-at-a-time over the
    * engine's own band rows (the spec trusts the signature expressions
    * — GramHashSpec pins those — and independently re-implements only
    * the CLAIM protocol).
    */
  private def expectedFold(chunks: Seq[Seq[(Long, String)]])
      : (Map[String, Long], Set[(Long, Long, Int)]) = {
    import spark.implicits._
    var owners = Map.empty[String, Long]
    var events = Set.empty[(Long, Long, Int)]
    chunks.foreach { chunk =>
      val rows = StreamingDedup.bandRows(chunk.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      val claims = rows.groupBy(r => s"${r._2}|${r._3}")
        .map { case (k, rs) => k -> rs.map(_._1).min }
      claims.foreach { case (k, c) =>
        if (!owners.contains(k)) owners += k -> c
      }
      rows.foreach { case (id, band, sig) =>
        val owner = owners(s"$band|$sig")
        if (id != owner) events += ((id, owner, band))
      }
    }
    (owners, events)
  }

  test("multi-epoch feed converges to the exact claim-fold owners and " +
      "events; index and events survive as committed parquet") {
    val stateDir = Files.createTempDirectory("graft_lsh_state").toString
    val eventsDir = Files.createTempDirectory("graft_lsh_events").toString
    val chunks = docChunks(3)
    runEpochs(stateDir, eventsDir, chunks)

    val (wantOwners, wantEvents) = expectedFold(chunks)
    val gotOwners = StreamingLshIndex.index(spark, stateDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotOwners == wantOwners)

    val gotEvents = StreamingLshIndex.dupEvents(spark, stateDir, eventsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotEvents == wantEvents)
    assert(gotEvents.nonEmpty, "fixture must exercise duplicate buckets")
  }

  test("replayed epoch is fenced: index bytes and events unchanged") {
    val stateDir = Files.createTempDirectory("graft_lsh_replay").toString
    val eventsDir = Files.createTempDirectory("graft_lsh_replay_ev").toString
    val chunks = docChunks(2)
    runEpochs(stateDir, eventsDir, chunks)

    def snapshot() = (
      StreamingLshIndex.index(spark, stateDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet,
      StreamingLshIndex.dupEvents(spark, stateDir, eventsDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
        .sorted)
    val before = snapshot()
    // at-least-once re-delivery of epoch 0: the marker fences it
    import spark.implicits._
    StreamingLshIndex.materializer(spark, stateDir, eventsDir)(
      chunks.head.toDF("doc_id", "text"), 0L)
    assert(snapshot() == before)
  }

  test("uncommitted event directories (crash debris) are invisible") {
    val stateDir = Files.createTempDirectory("graft_lsh_torn").toString
    val eventsDir = Files.createTempDirectory("graft_lsh_torn_ev").toString
    val chunks = docChunks(2)
    runEpochs(stateDir, eventsDir, chunks)
    val before = StreamingLshIndex.dupEvents(spark, stateDir, eventsDir).count()

    // a torn epoch: events parquet landed, marker never did
    import spark.implicits._
    Seq((999999L, 888888L, 0)).toDF("doc_id", "dup_of", "band")
      .write.parquet(s"$eventsDir/epoch=99")
    val after = StreamingLshIndex.dupEvents(spark, stateDir, eventsDir)
    assert(after.count() == before)
    assert(after.filter(col("doc_id") === 999999L).count() == 0)
  }

  test("an epoch touching few buckets writes only those shards and " +
      "leaves untouched shards' files byte-identical") {
    val stateDir = Files.createTempDirectory("graft_lsh_touch").toString
    val eventsDir = Files.createTempDirectory("graft_lsh_touch_ev").toString
    val chunks = docChunks(2)
    runEpochs(stateDir, eventsDir, chunks)

    def shardFiles(): Map[String, (Long, Long)] = {
      val root = new java.io.File(stateDir)
      root.listFiles().filter(_.getName.startsWith("state-")).flatMap { sd =>
        sd.listFiles().filter(_.getName.startsWith("__bucket=")).flatMap {
          bd => bd.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => s"${sd.getName}/${bd.getName}/${f.getName}" ->
              (f.length(), f.lastModified()))
        }
      }.toMap
    }
    val before = shardFiles()

    // one single-doc epoch: touches at most 4 band buckets → ≤ 4 shards
    import spark.implicits._
    val oneDoc = queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id").desc)
      .limit(1).collect().map(r => (r.getLong(0) + 1000000, r.getString(1)))
    StreamingLshIndex.materializer(spark, stateDir, eventsDir)(
      oneDoc.toSeq.toDF("doc_id", "text"), chunks.size.toLong)

    val after = shardFiles()
    val newDirs = after.keySet.map(_.split('/').head) --
      before.keySet.map(_.split('/').head)
    assert(newDirs.size == 1, s"exactly the new epoch dir: $newDirs")
    val newShards = after.keys.filter(_.startsWith(newDirs.head))
      .map(_.split('/')(1)).toSet
    assert(newShards.size <= 4,
      s"single doc touches ≤ 4 shards, wrote ${newShards.size}")
    // every surviving pre-epoch file is bit-for-bit untouched
    val survived = before.keySet.intersect(after.keySet)
    assert(survived.nonEmpty)
    survived.foreach { k => assert(before(k) == after(k), s"$k changed") }
  }

  test("isEpochCommitted distinguishes committed epochs from debris") {
    val stateDir = Files.createTempDirectory("graft_lsh_probe").toString
    val eventsDir = Files.createTempDirectory("graft_lsh_probe_ev").toString
    runEpochs(stateDir, eventsDir, docChunks(2))
    assert(ExactlyOnce.isEpochCommitted(spark, stateDir, 0L))
    assert(ExactlyOnce.isEpochCommitted(spark, stateDir, 1L))
    assert(!ExactlyOnce.isEpochCommitted(spark, stateDir, 99L))
  }
}
