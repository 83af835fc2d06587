package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE packed-state-key encoding shared by every durable keyed
  * state ([[StreamingJoinView]], [[StreamingRollup]],
  * [[StreamingGroupedKmv]], [[StreamingReservoir]]): each key part is
  * LENGTH-PREFIXED (`len:value`), and a NULL part is encoded as the
  * marker `_:`.
  *
  * Why not `concat_ws(sep, …)`: a separator-join collides whenever a
  * value contains the separator byte — ("ab") and ("a","b")
  * pack identically — and silently COALESCES nulls — (null,"x"),
  * ("x",null) and ("x") all pack to "x". Both collision classes merge
  * unrelated groups' durable state, which for a rollup/sketch/
  * reservoir is data corruption, not a display bug.
  *
  * This encoding is uniquely decodable, hence collision-free: a part
  * starts either with the non-digit `_` (null) or with a digit run
  * (its exact length) terminated by `:`, so no byte sequence parses
  * two ways and distinct key tuples always pack distinctly. GROUP BY
  * retains null groups (unlike an equi-join), which is why nulls are
  * encoded rather than filtered here — the join view drops null-keyed
  * rows before packing for its own join-semantics reason.
  *
  * MIGRATION NOTE — the packed key is PERSISTED state (it is the
  * bucket/compaction key under `ExactlyOnce.advanceStateBucketed`).
  * State directories written by the pre-round-9 `concat_ws("")`
  * encoding hold different `__gkey` bytes for the same group; they
  * must be rebuilt from source (replay the feed into a fresh state
  * dir) before resuming under this encoding. Mixing encodings in one
  * state dir would duplicate groups, never corrupt silently-merged
  * ones — the failure mode is visible, but rebuild anyway. The note
  * is ENFORCED at runtime, not left to docs: every packKey-keyed
  * materializer stamps [[CodecTag]] into its ledger on first write
  * (`ExactlyOnce.ensureLedgerTag`), and resuming a state dir that
  * carries committed epochs WITHOUT the stamp fails loudly instead of
  * silently splitting every group.
  */
object StateKeys {

  /** Ledger stamp naming this encoding (v2 = length-prefixed packKey;
    * v1 was the unstamped concat_ws era). Bump on any change to
    * [[packKeyCols]]'s byte format.
    */
  val CodecTag = "keycodec-2"

  /** Pack the named key columns (see object doc for the encoding). */
  def packKey(keys: Seq[String]): Column = packKeyCols(keys.map(col))

  /** Pack arbitrary key expressions. */
  def packKeyCols(keys: Seq[Column]): Column =
    concat(keys.map { c =>
      val s = c.cast("string")
      when(s.isNull, lit("_:"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }: _*)
}
