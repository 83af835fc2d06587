package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Checkpoint/restart fault tolerance (reference §4: checkpoint barriers
  * + restart strategy): a streaming query stopped and restarted from its
  * checkpointLocation must process each input file exactly once — no
  * loss, no reprocessing.
  */
class CheckpointSpec extends SparkSpec {

  test("streaming restart from checkpoint: each file processed exactly once") {
    val work = Files.createTempDirectory("graft_ckpt").toString
    val inDir = s"$work/in"
    val ckpt = s"$work/ckpt"
    new java.io.File(inDir).mkdirs()

    // stage 1: two event files
    val events = queries.Tables.events(spark, sf).limit(200).cache()
    events.filter(col("event_id") < 100)
      .write.mode("overwrite").parquet(s"$inDir/f1")
    val schema = events.schema
    def startQuery() = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true")
      .parquet(inDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("ckpt_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    val n1 = spark.table("ckpt_out").agg(sum(col("n"))).head().getLong(0)
    assert(n1 == 100, s"first run should see 100 rows, got $n1")

    // stage 2: add a file, restart from the same checkpoint
    events.filter(col("event_id") >= 100 && col("event_id") < 200)
      .write.mode("overwrite").parquet(s"$inDir/f2")
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()
    val n2 = spark.table("ckpt_out").agg(sum(col("n"))).head().getLong(0)
    assert(n2 == 200, s"restart must add exactly the new 100 rows, got $n2")
  }
}
