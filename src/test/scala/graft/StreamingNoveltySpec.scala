package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

import graft.streaming.StreamingNovelty

/** Durable incremental novelty: multi-epoch replay parity with the
  * declared batch `txt_novelty` (bit-for-bit), retraction of
  * previously-novel documents when a later epoch repeats their grams,
  * order independence, and replay fencing.
  */
class StreamingNoveltySpec extends SparkSpec {

  private def docs(): Seq[(Long, String)] =
    queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def noveltyRows(root: String) =
    StreamingNovelty.novelty(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq

  private def batchTruth() =
    SparkEntry.queries("txt_novelty")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq

  test("doc-ordered micro-batch replay is bit-equal to batch " +
      "txt_novelty — including docs whose early novelty was retracted " +
      "by later epochs") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_novelty").toString
    val chunks = docs().grouped((docs().size + 3) / 4).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      StreamingNovelty.materializer(spark, root)(
        chunk.toDF("doc_id", "text"), i.toLong)
    }
    assert(noveltyRows(root) == batchTruth())

    // a replayed epoch is a fenced no-op on both states
    StreamingNovelty.materializer(spark, root)(
      chunks.head.toDF("doc_id", "text"), 0L)
    assert(noveltyRows(root) == batchTruth())
  }

  test("retraction: a doc novel at epoch 0 loses its novelty when a " +
      "later epoch repeats the gram; epoch order does not matter") {
    import spark.implicits._
    val a = (1L, "a b c d e")          // one gram
    val b = (2L, "a b c d e f")        // shares a's gram + one unique
    val want = Seq((1L, 1L, 0L, 0.0), (2L, 2L, 1L, 0.5))

    val r1 = Files.createTempDirectory("graft_nov_fwd").toString
    StreamingNovelty.materializer(spark, r1)(Seq(a).toDF("doc_id", "text"), 0L)
    // after epoch 0, doc 1 is fully novel
    assert(noveltyRows(r1) == Seq((1L, 1L, 1L, 1.0)))
    StreamingNovelty.materializer(spark, r1)(Seq(b).toDF("doc_id", "text"), 1L)
    assert(noveltyRows(r1) == want)

    // reversed ingestion order converges to the same table
    val r2 = Files.createTempDirectory("graft_nov_rev").toString
    StreamingNovelty.materializer(spark, r2)(Seq(b).toDF("doc_id", "text"), 0L)
    StreamingNovelty.materializer(spark, r2)(Seq(a).toDF("doc_id", "text"), 1L)
    assert(noveltyRows(r2) == want)

    // both docs in ONE epoch: the shared gram is born duplicated
    val r3 = Files.createTempDirectory("graft_nov_one").toString
    StreamingNovelty.materializer(spark, r3)(
      Seq(a, b).toDF("doc_id", "text"), 0L)
    assert(noveltyRows(r3) == want)
  }
}
