package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.CdcParams

/** Chunked JDBC snapshot reader — the `position=initial` full-table
  * phase (reference `MySqlSource.splitSize` chunking,
  * MySQLCDC2AWSMSK.scala:255-258,271: snapshot is read in `chunk_size`-row
  * key-range chunks, one per parallel reader, as an OOM guard for wide
  * rows).
  *
  * Spark equivalent: `spark.read.jdbc` with `partitionColumn`/bounds/
  * `numPartitions` — each partition reads one key range, so
  * `numPartitions = keySpan / chunkSize` reproduces the reference's
  * chunking. After the snapshot lands, the streaming phase takes over
  * from the recorded position (KafkaCdcSource) — the snapshot→binlog
  * handoff of SURVEY §7.
  *
  * Not drivable in the zero-egress container (no MySQL); the partition
  * predicate math is unit-tested (JdbcSnapshotSpec).
  */
object JdbcSnapshot {

  /** Number of partitions for a PK span and chunk size (≥1). */
  def numChunks(minKey: Long, maxKey: Long, chunkSize: Int): Int = {
    val span = math.max(maxKey - minKey + 1, 1L)
    math.max(((span + chunkSize - 1) / chunkSize).toInt, 1)
  }

  /** The per-partition WHERE predicates Spark's JDBC source will
    * generate for the equivalent (lowerBound, upperBound, numPartitions)
    * — exposed for testing/inspection.
    */
  def chunkPredicates(pkCol: String, minKey: Long, maxKey: Long,
      chunkSize: Int): Seq[String] = {
    val n = numChunks(minKey, maxKey, chunkSize)
    val span = maxKey - minKey + 1
    val step = math.max(span / n, 1L)
    (0 until n).map { i =>
      val lo = minKey + i * step
      val hi = minKey + (i + 1) * step
      if (i == 0) s"$pkCol < $hi"
      else if (i == n - 1) s"$pkCol >= $lo"
      else s"$pkCol >= $lo AND $pkCol < $hi"
    }
  }

  /** Snapshot one table through the chunked JDBC reader.
    *
    * Chunking REQUIRES a primary key (the reference's incremental
    * snapshot algorithm has the same constraint — README.md:7: tables
    * without a PK must disable it via
    * `scan.incremental.snapshot.enabled=false`). For a key-less table
    * use [[readSingle]], the explicit single-reader equivalent of that
    * disabled mode, instead of silently degrading.
    */
  def read(spark: SparkSession, params: CdcParams, db: String,
      table: String, pkCol: String, minKey: Long, maxKey: Long): DataFrame = {
    require(pkCol != null && pkCol.nonEmpty,
      s"chunked snapshot of $db.$table needs a primary-key column; " +
        "key-less tables must use JdbcSnapshot.readSingle " +
        "(reference: scan.incremental.snapshot.enabled=false)")
    spark.read
      .format("jdbc")
      .option("url", s"jdbc:mysql://${params.host}:${params.port}/$db" +
        s"?serverTimezone=${params.serverTimeZone}")
      .option("dbtable", s"$db.$table")
      .option("user", params.username)
      .option("password", params.password)
      .option("partitionColumn", pkCol)
      .option("lowerBound", minKey.toString)
      .option("upperBound", (maxKey + 1).toString)
      .option("numPartitions",
        numChunks(minKey, maxKey, params.chunkSize).toString)
      .option("fetchsize", math.min(params.chunkSize, 10000).toString)
      .load()
  }

  /** Single-reader whole-table snapshot — the key-less-table mode (the
    * reference's `scan.incremental.snapshot.enabled=false`): one
    * partition, no key-range predicates, bounded only by `fetchsize`
    * cursor batching. Use only when no PK exists; it cannot parallelize
    * and cannot checkpoint mid-table.
    */
  def readSingle(spark: SparkSession, params: CdcParams, db: String,
      table: String): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", s"jdbc:mysql://${params.host}:${params.port}/$db" +
        s"?serverTimezone=${params.serverTimeZone}")
      .option("dbtable", s"$db.$table")
      .option("user", params.username)
      .option("password", params.password)
      .option("fetchsize", math.min(params.chunkSize, 10000).toString)
      .load()
}
