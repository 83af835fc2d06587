package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the LLM-pipeline
  * extension surface) is declared here as a named query over the
  * driver-generated parquet fixtures, with a DuckDB oracle where the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All query modules, merged. */
  private val allDefs: Map[String, QueryDef] =
    RelationalQueries.defs ++
      ExtendedQueries.defs ++
      TpchQueries.defs ++
      PipelineQueries.defs ++
      CdcQueries.defs ++
      TextQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      ClusteringQueries.defs ++
      MultimodalQueries.defs ++
      CurationQueries.defs ++
      AnalyticsQueries.defs ++
      OpsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's whole pipeline shape end-to-end: events parquet →
    * Debezium envelope replay → dynamic enrichment (pk + truncation) →
    * Kafka sink projection (key/value/topic/partition).
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, d) => name -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }
}
