package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for hot join/aggregation keys (SURVEY §7 scale notes;
  * the 100 TB answer when AQE's skew-join split isn't available — e.g.
  * aggregations, or stream-static joins where AQE doesn't apply).
  *
  * Pattern: the skewed (big) side gets a deterministic salt derived from
  * a high-cardinality column (NOT random — keeps runs reproducible and
  * retry-safe); the small side is replicated once per salt value. The
  * join key becomes (key, salt), spreading one hot key over `n`
  * shuffle partitions.
  */
object Salting {

  /** Add `__salt` in [0, n) to the skewed side, derived from `entropy`
    * (a row-identifying column) — deterministic across retries, unlike
    * rand()-based salting which breaks task re-execution semantics.
    */
  def saltSkewed(df: DataFrame, entropy: Column, n: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(entropy), lit(n.toLong)).cast("int"))

  /** Replicate the small side once per salt value. */
  def replicateForSalt(df: DataFrame, n: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))

  /** Salted equi-join: equivalent rows to `big.join(small, bigKey ===
    * smallKey)` but with the hot key spread across `n` partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, entropy: Column,
      n: Int, joinType: String = "inner"): DataFrame = {
    val b = saltSkewed(big, entropy, n)
    val s = replicateForSalt(small, n)
    b.join(s, bigKey === smallKey && b("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for a skewed grouping key —
    * partial aggregate on (key, salt), then final on key. `partials`
    * maps each aggregated column to its re-combining expression (e.g.
    * partial `count` recombines with `sum`).
    */
  def saltedCount(df: DataFrame, key: Column, entropy: Column,
      n: Int): DataFrame =
    saltSkewed(df, entropy, n)
      .groupBy(key.as("__k"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as("n"))
}
