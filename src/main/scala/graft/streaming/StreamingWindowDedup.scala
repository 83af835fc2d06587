package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Deterministic streaming twin of the batch `evt_window_dedup` query:
  * keep the FIRST event per (user, type, 1-minute tumbling window),
  * "first" by EVENT TIME (ts, event_id) — not by arrival.
  *
  * Spark's native streaming `dropDuplicates` keeps the first ARRIVAL,
  * so its output depends on delivery order: a redelivered or reordered
  * stream (every at-least-once source after a failure) can pick a
  * different representative than the batch backfill. Keyed min-state
  * converges to the batch answer under ANY arrival order — the state
  * per key is the running minimum of (sec, event_id), monotone
  * non-increasing, so replays and reorders are absorbed (the same
  * idempotent-representative idea as ExactlyOnce.upsertByKey, applied
  * to windows). State: one 24-byte record per active (user, type,
  * minute) key; with a watermark upstream, closed windows can be
  * dropped via timeouts — the spec exercises the convergence property.
  */
object StreamingWindowDedup {

  /** An input event, pre-projected to epoch seconds. */
  final case class EventRow(event_id: Long, user_id: Long,
      event_type: String, sec: Long)

  /** The chosen representative of one (user, type, minute) window. */
  final case class WindowFirst(user_id: Long, event_type: String,
      minute: Long, event_id: Long, sec: Long)

  def firstPerWindow(events: Dataset[EventRow]): Dataset[WindowFirst] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type, e.sec / 60L))
      .mapGroupsWithState[WindowFirst, WindowFirst](
        GroupStateTimeout.NoTimeout()) {
        (key: (Long, String, Long), es: Iterator[EventRow],
         state: org.apache.spark.sql.streaming.GroupState[WindowFirst]) =>
          val incoming = es.minBy(e => (e.sec, e.event_id))
          val best = state.getOption match {
            case Some(cur) if cur.sec < incoming.sec ||
                (cur.sec == incoming.sec && cur.event_id <= incoming.event_id) =>
              cur
            case _ => WindowFirst(key._1, key._2, key._3,
              incoming.event_id, incoming.sec)
          }
          state.update(best)
          best
      }
  }
}
