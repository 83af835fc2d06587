package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.operators.Kmv

/** Online (streaming) distinct-count estimation: the KMV sketch
  * maintained incrementally across micro-batches — the streaming twin
  * of the oracle-checked `rel_kmv_distinct` query, sharing
  * [[graft.operators.Kmv]]'s hash and estimator so the online estimate
  * is BIT-EQUAL to the batch one after the same ids (the k smallest of
  * a union is the union of per-shard k-smallest, so sharding changes
  * nothing about the final sketch).
  *
  * Scale shape: ids hash-route to `shards` keyed state cells, each
  * holding a sorted vector of ≤ k distinct hash minima — state is
  * k·S longs total, ingest parallelism is S. A new id mutates state
  * only when its hash beats the cell's current k-th minimum, so
  * steady-state batches touch state rarely (the classic KMV property:
  * expected total updates over a stream of n distinct ids is
  * O(k·S·ln n), not n).
  */
object StreamingKmv {

  /** One shard's current minima (Update-mode output; `n` is the count
    * of ids routed to the shard so far, monotone — "row with max n per
    * shard" is the live state).
    */
  final case class ShardMins(shard: Int, mins: Seq[Long], n: Long)

  /** Incrementally sketch an id stream: per shard, the k smallest
    * DISTINCT hashes of the ids seen so far.
    */
  def sketch(ids: Dataset[Long], shards: Int, k: Int, hashSeed: Long)
      : Dataset[ShardMins] = {
    val session = ids.sparkSession
    import session.implicits._
    ids
      .groupByKey(id => (Kmv.hash(id, hashSeed) % shards).toInt)
      .mapGroupsWithState[ShardMins, ShardMins](
        GroupStateTimeout.NoTimeout()) {
        (shard: Int, xs: Iterator[Long],
         state: org.apache.spark.sql.streaming.GroupState[ShardMins]) =>
          val prev = state.getOption.getOrElse(ShardMins(shard, Vector.empty, 0L))
          var mins = collection.immutable.SortedSet.empty[Long] ++ prev.mins
          var n = prev.n
          xs.foreach { id =>
            n += 1
            val h = Kmv.hash(id, hashSeed)
            // admit when below capacity or beating the current k-th min
            if (mins.size < k) mins += h
            else if (h < mins.max && !mins.contains(h)) mins = mins - mins.max + h
          }
          val next = ShardMins(shard, mins.toVector, n)
          state.update(next)
          next
      }
  }

  /** Merge per-shard minima into the global sketch and estimate: the k
    * smallest hashes overall, D-hat = (k-1)·P/h_(k). Returns
    * (k, kthHash, estimate). Under-filled sketches short-circuit: with
    * no ids ingested the result is (0, 0, 0.0) rather than a crash on
    * `last`, and with fewer than k distinct hashes the sketch holds
    * EVERY distinct hash, so the distinct count is exact = size — the
    * estimator formula would be biased there (and divides by zero when
    * hash 0 is among the minima). The batch `rel_kmv_distinct` query
    * always runs with size == k on its fixture, so bit-parity with the
    * oracle-checked estimate is unaffected.
    */
  def mergedEstimate(shards: Seq[ShardMins], k: Int): (Long, Long, Double) = {
    val global = shards.flatMap(_.mins).distinct.sorted.take(k)
    if (global.isEmpty) (0L, 0L, 0.0)
    else if (global.size < k) (global.size.toLong, global.last, global.size.toDouble)
    else (k.toLong, global.last, Kmv.estimate(k.toLong, global.last))
  }
}
