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
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/part.parquet")
  def nation(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/nation.parquet")
  def region(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/region.parquet")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as long nanos (runtime-settable legacy conf)
    * and convert to a micros timestamp (truncation — matches DuckDB's
    * second-level formatting in every oracle).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")
}
