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

  /** 63-bit bucket key: two INDEPENDENT 31-poly hashes — the plain one
    * and a `"2|"`-salted one — packed as
    * `(h1 & 0x7FFFFFFF) * 2^32 + h2`. The pack's maximum is exactly
    * 2^63 − 1, so it never overflows a signed BIGINT in either engine
    * (ANSI-safe — no wraparound semantics needed). Use this wherever
    * the hash is a BUCKET IDENTITY (two distinct keys colliding merges
    * their buckets): at corpus scale a 32-bit key sees its first
    * collision near ~90 k keys and guarantees merges in the millions
    * (N²/2^33), while the 63-bit pack keeps the expectation below one
    * collision out to ~4 B keys. [[uhash]] remains right for sampling /
    * similarity hashing, where a rare collision perturbs one score
    * instead of corrupting a bucket.
    */
  def uhash64(c: Column): Column = {
    import org.apache.spark.sql.functions.{concat, lit, shiftleft}
    shiftleft(uhash(c).bitwiseAND(lit(2147483647L)), 32)
      .plus(uhash(concat(lit("2|"), c)))
  }

  /** DuckDB mirror of [[uhash64]]. */
  def uhash64Sql(e: String): String =
    s"(${uhashSql(e)} % 2147483648) * 4294967296 + ${uhashSql(s"'2|' || ($e)")}"
}
