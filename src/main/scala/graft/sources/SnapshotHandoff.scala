package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-then-incremental handoff — the `position=initial` semantics
  * (SURVEY §7 hard part 2). Flink CDC does a lock-free chunked snapshot
  * and records a binlog watermark; on completion the binlog reader
  * resumes from that watermark so each change is seen exactly once
  * across the phase switch.
  *
  * Spark decomposition:
  *   1. batch snapshot (JdbcSnapshot / parquet) while recording the
  *      high-watermark offset (here: max event_id; in production the
  *      binlog file/pos captured at snapshot start),
  *   2. streaming phase reading ONLY records beyond the watermark.
  *
  * The filter is pushed to the source (a pruned scan / Kafka
  * startingOffsets), so the stream never rereads snapshot data, and
  * records landing during the snapshot are picked up by the stream —
  * no gap, no overlap, as [[graft.HandoffSpec]] proves.
  */
object SnapshotHandoff {

  final case class Snapshot(data: DataFrame, watermark: Long)

  /** Phase 1: batch snapshot of events up to (and including) the
    * current high watermark.
    */
  def snapshot(spark: SparkSession, sfDir: String): Snapshot = {
    val all = graft.queries.Tables.events(spark, sfDir)
    val wm = all.agg(max(col("event_id"))).head().getLong(0)
    Snapshot(all.filter(col("event_id") <= wm), wm)
  }

  /** Phase 2: the incremental stream, fenced to records AFTER the
    * snapshot watermark. With a Kafka source the fence is
    * `startingOffsets`/`startingTimestamp`; with the file replay it is
    * a pushed-down filter.
    */
  def incremental(spark: SparkSession, sfDir: String, watermark: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // $sfDir/events.parquet as a DIRECTORY of arriving files (a CDC
    // landing zone); the fixture's single-file layout goes through
    // CdcReplay.stream instead. Schema comes from a batch peek so both
    // nanos-long and timestamp layouts work.
    val path = s"$sfDir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(batchSchema).parquet(path)
    val converted =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    converted.filter(col("event_id") > watermark)
  }
}
