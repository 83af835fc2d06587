package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.operators.{MgSummary, MisraGries}

/** Online (streaming) heavy hitters: the Misra–Gries sketch maintained
  * incrementally across micro-batches — the streaming twin of the
  * batch `txt_heavy_hitters` candidate stage (same `MisraGries`
  * reduce/merge, so the two paths share one error analysis).
  *
  * Scale shape: tokens hash-route to `shards` keyed state cells
  * (`groupByKey(hash % shards)`), so sketch state is k counters × S
  * shards — never vocabulary-sized — and ingest parallelism is S, not
  * 1 (a single global sketch would serialize the whole stream through
  * one state cell). Each token always lands in the same shard, so a
  * shard's summary sees the complete stream of its own tokens, and the
  * per-shard guarantee (every item with count > n_shard/(k+1)
  * present) implies the global one after [[mergeShards]]: the MG merge
  * is associative with additive error, giving undercount ≤ n/(k+1)
  * over any merge tree — any item with true count > n/(k+1) survives.
  *
  * As in batch, the sketch only NOMINATES: serving exact counts still
  * takes the second recount pass over the nominated ≤ S·k candidates.
  */
object StreamingHeavyHitters {

  /** One shard's live summary after a micro-batch (Update-mode output:
    * the memory/console sink sees each shard's latest state; `n` is
    * monotone per shard, so "row with max n per shard" is the current
    * summary).
    */
  final case class ShardSummary(shard: Int, counts: Map[String, Long], n: Long)

  /** Incrementally sketch a word stream into `shards` MG summaries of
    * capacity `k` each. Emits every shard's updated summary once per
    * micro-batch that touched it.
    */
  def sketch(words: Dataset[String], shards: Int, k: Int)
      : Dataset[ShardSummary] = {
    val session = words.sparkSession
    import session.implicits._
    val mg = new MisraGries(k)
    words
      .groupByKey(w => math.floorMod(w.hashCode, shards))
      .mapGroupsWithState[MgSummary, ShardSummary](
        GroupStateTimeout.NoTimeout()) {
        (shard: Int, ws: Iterator[String],
         state: org.apache.spark.sql.streaming.GroupState[MgSummary]) =>
          val prev = state.getOption.getOrElse(MgSummary(Map.empty, 0L))
          val next = ws.foldLeft(prev)(mg.reduce)
          state.update(next)
          ShardSummary(shard, next.counts, next.n)
      }
  }

  /** Merge per-shard summaries into one global ≤k-entry summary. The
    * MG merge keeps the additive bound, so the global candidate
    * guarantee (count > Σn/(k+1) ⇒ present) holds even though shards
    * were built independently.
    */
  def mergeShards(summaries: Seq[ShardSummary], k: Int): MgSummary = {
    val mg = new MisraGries(k)
    summaries.map(s => MgSummary(s.counts, s.n)).foldLeft(mg.zero)(mg.merge)
  }
}
