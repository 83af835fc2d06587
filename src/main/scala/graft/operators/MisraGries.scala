package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary: k counters, one linear pass.
  *
  * Guarantee: every item whose true frequency exceeds n/(k+1) is present
  * in the final summary (counts are lower bounds, undercounted by at most
  * n/(k+1)). The merge uses the mergeable-summaries formulation (sum the
  * two counter sets, then subtract the (k+1)-th largest count and drop
  * non-positive entries), which preserves the additive error bound across
  * arbitrary merge trees — exactly what Spark's partial aggregation does.
  *
  * The engine never serves sketch counts directly: the summary is the
  * CANDIDATE stage of a two-pass exact heavy-hitter query (sketch →
  * broadcast ≤k candidates → exact recount of candidates only → threshold
  * filter). At 100 TB the sketch pass is a map-side-combined aggregation
  * whose merged state is k entries per partition — the vocabulary-sized
  * shuffle of a full word count never happens, and the second pass scans
  * once more filtering against a ≤k-element broadcast set.
  */
final case class MgSummary(counts: Map[String, Long], n: Long)

final class MisraGries(k: Int)
    extends Aggregator[String, MgSummary, MgSummary] with Serializable {
  require(k > 0, "MisraGries capacity must be positive")

  override def zero: MgSummary = MgSummary(Map.empty, 0L)

  override def reduce(b: MgSummary, item: String): MgSummary = {
    val cur = b.counts.getOrElse(item, 0L)
    val next =
      if (cur > 0 || b.counts.size < k) b.counts.updated(item, cur + 1L)
      else {
        // all k counters busy: decrement everyone (the new item's single
        // occurrence cancels against one unit of each survivor)
        b.counts.iterator
          .map { case (s, c) => s -> (c - 1L) }
          .filter(_._2 > 0L)
          .toMap
      }
    MgSummary(next, b.n + 1L)
  }

  override def merge(b1: MgSummary, b2: MgSummary): MgSummary = {
    val summed: Map[String, Long] =
      (b1.counts.keySet ++ b2.counts.keySet).iterator.map { s =>
        s -> (b1.counts.getOrElse(s, 0L) + b2.counts.getOrElse(s, 0L))
      }.toMap
    val pruned =
      if (summed.size <= k) summed
      else {
        val d = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        summed.iterator
          .map { case (s, c) => s -> (c - d) }
          .filter(_._2 > 0L)
          .toMap
      }
    MgSummary(pruned, b1.n + b2.n)
  }

  override def finish(r: MgSummary): MgSummary = r
  override def bufferEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
