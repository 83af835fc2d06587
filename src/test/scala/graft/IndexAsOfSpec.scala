package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.operators.ExactlyOnce
import graft.streaming.{StreamingDupSpans, StreamingLshIndex}

/** As-of time travel for the standing dedup indexes: the LSH band
  * index (versioned protocol) and the dup-spans gram index
  * (append-only LSM) reconstruct every reachable committed epoch
  * exactly — "the dedup index as of epoch N" for reproducible
  * curation reruns — and fail loudly past retention (versioned) or
  * compaction (LSM), never silently returning the wrong epoch.
  */
class IndexAsOfSpec extends SparkSpec {

  private def docChunks(n: Int): Seq[Seq[(Long, String)]] = {
    val docs = queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    docs.grouped((docs.size + n - 1) / n).toSeq
  }

  test("dup-spans LSM: every pre-compaction epoch reconstructs " +
      "exactly; compaction retires as-of history below the base, " +
      "loudly") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft_ds_asof").toString
    val spansDir = Files.createTempDirectory("graft_ds_asof_sp").toString
    def fullIndex(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("gh1"), r.getAs[Long]("gh2"),
        r.getAs[Long]("dmin"))).toSet
    val chunks = docChunks(4)
    val snapshots = chunks.zipWithIndex.map { case (chunk, i) =>
      // compactEvery=0: no mid-stream fold, every epoch stays as-of
      // reachable
      StreamingDupSpans.materializer(spark, stateDir, spansDir, 0)(
        chunk.toDF("doc_id", "text"), i.toLong)
      fullIndex(ExactlyOnce.appendedState(spark, stateDir)(
        StreamingDupSpans.emptyIndex(spark))
        .select(col("gh1"), col("gh2"), col("dmin")))
    }
    // every epoch reconstructs bit-exactly
    snapshots.zipWithIndex.foreach { case (snap, e) =>
      assert(fullIndex(StreamingDupSpans.indexAsOf(
        spark, stateDir, e.toLong)) == snap, s"as-of epoch $e")
    }
    assert(ExactlyOnce.appendedAsOfEpochs(spark, stateDir) ==
      chunks.indices.map(_.toLong))

    // compact: epochs below the new base are retired — loud failure,
    // epochs at/above it still reconstruct
    val base = ExactlyOnce.compactAppended(spark, stateDir)(
      StreamingDupSpans.emptyIndex(spark))
    assert(base.contains((chunks.size - 1).toLong))
    assert(fullIndex(StreamingDupSpans.indexAsOf(
      spark, stateDir, base.get)) == snapshots.last)
    val e = intercept[RuntimeException] {
      StreamingDupSpans.indexAsOf(spark, stateDir, 0L).collect()
    }
    assert(e.getMessage.contains("compacted"), e.getMessage)
  }

  test("LSH band index: every retained epoch reconstructs exactly; " +
      "a retired epoch fails loudly") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft_lsh_asof").toString
    val eventsDir = Files.createTempDirectory("graft_lsh_asof_ev").toString
    def owners(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[String]("bucket_key"),
        r.getAs[Long]("owner"))).toSet
    val chunks = docChunks(3)
    // retain=3 keeps every version of this 3-epoch run reachable
    val snapshots = chunks.zipWithIndex.map { case (chunk, i) =>
      StreamingLshIndex.materializer(spark, stateDir, eventsDir,
        retain = 3)(chunk.toDF("doc_id", "text"), i.toLong)
      owners(StreamingLshIndex.index(spark, stateDir))
    }
    snapshots.zipWithIndex.foreach { case (snap, e) =>
      assert(owners(StreamingLshIndex.indexAsOf(
        spark, stateDir, e.toLong, retain = 3)) == snap,
        s"as-of epoch $e")
    }
    assert(ExactlyOnce.versionedOwnerEpochs(spark, stateDir)
      .contains(0L))

    // a default-retention run retires epoch 0 once two newer versions
    // own its buckets: the as-of read must refuse, not guess
    val d2 = Files.createTempDirectory("graft_lsh_asof2").toString
    val ev2 = Files.createTempDirectory("graft_lsh_asof2_ev").toString
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      StreamingLshIndex.materializer(spark, d2, ev2)(
        chunk.toDF("doc_id", "text"), i.toLong)
    }
    val err = intercept[RuntimeException] {
      StreamingLshIndex.indexAsOf(spark, d2, 0L).collect()
    }
    assert(err.getMessage.contains("retain"), err.getMessage)
  }
}
