package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lake-side maintenance for a CDC landing zone — the operational jobs
  * that keep a streaming sink queryable at 100 TB:
  *
  *   - **Compaction**: a micro-batch sink writes one small file per
  *     trigger per partition; over days that is millions of KB-files
  *     and scan planning collapses. Compaction rewrites a directory
  *     into ~`targetFileBytes` files (count derived from actual input
  *     size, floor 1) then swaps atomically-enough via rename —
  *     a table format (Delta/Iceberg) does the same with a txn log.
  *   - **Schema evolution**: CDC upstreams add columns; epochs land
  *     with different schemas. `readEvolved` = `mergeSchema` union of
  *     all epoch schemas (old rows null-fill new columns), the read
  *     side of schema-on-write evolution.
  */
object LakeMaintenance {

  /** Byte size of all data files under `dir`. */
  def dataSize(spark: SparkSession, dir: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Compact `dir` in place to ~targetFileBytes per file. Returns the
    * resulting file count.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val nFiles = math.max(
      (dataSize(spark, dir) + targetFileBytes - 1) / targetFileBytes, 1L).toInt
    val tmp = dir.stripSuffix("/") + "__compacting"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    nFiles
  }

  /** Read a directory whose epochs have evolving schemas. */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}
