package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One verifiable operator query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Column names MUST match between the two — the
  * driver's compare sorts columns by name before hashing values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Oracle determinism helpers.
    *
    * The fixture money columns are doubles generated at 2-decimal
    * precision; summing them as doubles is order-dependent (Spark's
    * partial aggregation vs DuckDB's scan order ⇒ different low bits).
    * Casting each value to `decimal(18,2)` first recovers the exact
    * generated value, all arithmetic stays exact in decimal, and only the
    * final result is cast back to double — bit-identical in both engines.
    */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Unsigned 32-bit view of the Java string hash (the deterministic
    * 31-polynomial) — the engine's reproducible hash for sampling and
    * bucketing, exactly replicable in the DuckDB oracle via [[uhashSql]].
    */
  def uhash(c: Column): Column =
    graft.functions.JavaHash.javaStringHash(c)
      .cast("long").bitwiseAND(org.apache.spark.sql.functions.lit(4294967295L))

  /** DuckDB mirror of [[uhash]] — already-unsigned left fold. */
  def uhashSql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, LENGTH($e) + 1),
       |    i -> CAST(ord(SUBSTR($e, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % 4294967296)""".stripMargin
}
