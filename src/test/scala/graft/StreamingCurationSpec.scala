package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.QueryDef.uhash

/** Batch/stream unification of the curation surface: the sampling,
  * quality, and gram expressions are stateless projections, so the
  * SAME transform applied under readStream must yield exactly the
  * batch result on identical input rows — the property that lets one
  * curation codebase serve both the backfill and the live ingest path.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample + quality signals + trigram hashes — one
    * shared DataFrame → DataFrame transform (the batch/stream-unified
    * operator shape).
    */
  private def curate(docs: DataFrame): DataFrame =
    docs
      .withColumn("h", uhash(concat(lit("doc_"), col("doc_id"))))
      .filter(col("h") % 5 === 0)
      .withColumn("n_tokens", size(split(trim(col("text")), " ")))
      .withColumn("ghs", graft.functions.WordGramHashes.wordGramHashes(
        col("text"), 3, lit("")))
      .select(col("doc_id"), col("n_tokens"), size(col("ghs")).as("n_grams"))

  test("streamed curation equals batch curation on the same rows") {
    val rows = (1L to 200L).map(i =>
      (i, s"sample document number $i with some shared tokens and id $i"))

    val batch = curate(rows.toDF("doc_id", "text"))
      .collect().map(_.toString).sorted

    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = curate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur_stream")
      .outputMode("append").start()
    try {
      // deliver in two micro-batches to exercise incremental execution
      in.addData(rows.take(100): _*)
      in.addData(rows.drop(100): _*)
      q.processAllAvailable()
      val streamed = spark.table("cur_stream")
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("stream-static vocab encode: streamed docs join the broadcast " +
      "vocab and match the batch encoding") {
    import org.apache.spark.sql.expressions.Window
    // static side: frequency-ranked vocab built once (the batch
    // artifact a live tokenizer would load), tiny and broadcast
    val rows = (1L to 120L).map(i =>
      (i, s"alpha beta gamma token$i alpha beta delta"))
    val toks = rows.toDF("doc_id", "text")
      .select(col("doc_id"), posexplode(split(trim(col("text")), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(4)
      .withColumn("tid", row_number()
        .over(Window.orderBy(col("cnt").desc, col("tok").asc)).cast("long"))
      .select(col("tok"), col("tid"))

    def encode(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), posexplode(split(trim(col("text")), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("tok"))
        .join(broadcast(vocab), Seq("tok"), "left")
        .withColumn("tid", coalesce(col("tid"), lit(0L)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("tid") === 0L, 1L).otherwise(0L)).as("n_oov"))

    val batch = encode(rows.toDF("doc_id", "text"))
      .collect().map(_.toString).sorted

    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = encode(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("vocab_stream")
      .outputMode("complete").start()
    try {
      in.addData(rows.take(60): _*)
      in.addData(rows.drop(60): _*)
      q.processAllAvailable()
      val streamed = spark.table("vocab_stream")
        .collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
