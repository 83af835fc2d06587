package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver-generated parquet fixtures
  * (TESTDATA.md: region nation customer supplier part orders lineitem
  * events documents embeddings under /root/testdata/sf{N}). Every query
  * takes `(spark, sfDir)` and reads only what it needs so Catalyst prunes
  * columns down to the parquet scan.
  */
object Tables {

  /** Round-robin rebalance — the reference's `rebalance` operator
    * (SURVEY §2 #4, MySQLCDC2AWSMSK.scala:95). The fixture parquet files
    * are single row-groups, so scans arrive in ONE partition; CPU-heavy
    * per-row stages (JSON construction, gram explode, vector math) must
    * be spread across cores first. On a cluster the same call breaks
    * source skew before expensive map stages.
    */
  def rebalance(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  // one-time, targeted: WindowExec's "No Partition Defined" warning
  // demotes to ERROR the first time a DELIBERATE tiny global window is
  // declared. A constant partition key cannot carry the intent — the
  // optimizer folds `partitionBy(lit(0))` away and the physical plan
  // is Exchange SinglePartition either way (verified on Spark 4.1) —
  // so the honest mechanism is the logger. Accidental BIG global
  // windows stay gated where it matters: PlanSweepSpec fails any
  // declared query whose plan grows an unexplained global window.
  private lazy val silenceDeliberateGlobalWindowWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // non-log4j2 deployments: keep the noise

  /** A DELIBERATELY single-partition window over a provably TINY
    * frame — O(groups) rows: a language-offset table, a 256-row
    * vocab, an hour/day series, a top-20 rank. Semantically exactly
    * `Window.orderBy(...)`; the point of the helper is (a) marking
    * the intent at the call site and (b) demoting WindowExec's
    * "No Partition Defined" warning (see above) so it keeps meaning
    * "someone accidentally windowed a BIG frame globally". Never use
    * over an input that grows with the corpus.
    */
  def tinyGlobalWindow(order: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.expressions.WindowSpec = {
    silenceDeliberateGlobalWindowWarn
    org.apache.spark.sql.expressions.Window.orderBy(order: _*)
  }
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/part.parquet")
  def nation(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/region.parquet")
  /** Normalize the events `ts` layout: convert to a micros timestamp
    * ONLY when the column is physically a long (the historical
    * TIMESTAMP(NANOS)-as-long layout); TIMESTAMP(_NTZ) passes through
    * untouched. THE single place both the batch loader and the
    * streaming replay (`CdcReplay.rawEventsStream`) apply the
    * conversion — a one-sided change here is what reintroduces the
    * 1000x timestamp bug the streaming value-bytes tripwires catch.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df

  /** `events.ts` has shipped as both TIMESTAMP(NANOS) (readable only as
    * long nanos via the runtime-settable legacy conf) and
    * TIMESTAMP(MICROS); the schema peek + [[normalizeEventsTs]] handle
    * either (truncation to micros matches DuckDB's second-level
    * formatting in every oracle).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(s.read.parquet(s"$dir/events.parquet"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** Exact row count of a parquet file/dir from its FOOTERS — a
    * driver-side metadata read (the same class as file listing), not a
    * Spark job. Broadcast-gate decisions (`hintIf(n <= limit)`) need
    * only the base table's cardinality; paying a cluster count() job
    * per query construction for it was pure fixed overhead (r17, guide
    * §1.2 — the job floor measured 0.36–0.44 s on the bench box, per
    * gate). Falls back to a Spark count if any footer is unreadable.
    */
  def parquetRowCount(s: SparkSession, path: String): Long =
    try {
      val conf = s.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      import scala.jdk.CollectionConverters._
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getLen > 0 &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")) {
          val in = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(f, conf))
          try n += in.getFooter.getBlocks.asScala.map(_.getRowCount).sum
          finally in.close()
        }
      }
      n
    } catch {
      // NonFatal only (r17 verdict item 4): a fatal error (OOM,
      // interrupt, linkage) must propagate, not silently degrade into
      // a full cluster count() job.
      case scala.util.control.NonFatal(_) => s.read.parquet(path).count()
    }

  /** [[parquetRowCount]] of the documents fixture — the broadcast-gate
    * cardinality used by the LSH/graph family. */
  def documentsRowCount(s: SparkSession, dir: String): Long =
    parquetRowCount(s, s"$dir/documents.parquet")
}
