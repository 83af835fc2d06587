package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_seconds}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Deterministic streaming twin of the batch `evt_window_dedup` query:
  * keep the FIRST event per (user, type, 1-minute tumbling window),
  * "first" by EVENT TIME (ts, event_id) — not by arrival.
  *
  * Spark's native streaming `dropDuplicates` keeps the first ARRIVAL,
  * so its output depends on delivery order: a redelivered or reordered
  * stream (every at-least-once source after a failure) can pick a
  * different representative than the batch backfill. Keyed min-state
  * converges to the batch answer under ANY arrival order that the
  * watermark admits — the state per key is the running minimum of
  * (sec, event_id), monotone non-increasing, so replays and reorders
  * are absorbed (the same idempotent-representative idea as
  * ExactlyOnce.upsertByKey, applied to windows).
  *
  * State is BOUNDED (round-4 verdict item 3): the operator runs under
  * an event-time watermark of `latenessSec`, and every key arms an
  * event-time timeout at its window end — once the watermark passes a
  * window, its 24-byte state record is dropped, so live state is
  * O(windows still inside the lateness horizon), not one record per
  * (user, type, minute) forever. The expiry semantics are internally
  * consistent: an event for an expired window necessarily has
  * event-time below the watermark, so the operator's late-row filter
  * drops it before it could re-admit the window — no
  * divergent-representative window can reopen (unlike a
  * processing-time TTL, where re-admission is the documented trade;
  * cf. StreamingDedup). Callers wanting the unbounded exact-parity
  * mode pass a lateness horizon longer than the stream's event span.
  */
object StreamingWindowDedup {

  /** An input event, pre-projected to epoch seconds. */
  final case class EventRow(event_id: Long, user_id: Long,
      event_type: String, sec: Long)

  /** [[EventRow]] plus the derived event-time column. The timestamp is
    * a FIELD of the deserialized type on purpose: were it only a
    * dangling projected column, column pruning could drop the
    * watermark-annotated attribute before the stateful operator and
    * with it the operator's late-row filter — the thing that makes
    * expiry consistent (expired ⇒ late ⇒ filtered, never re-admitted).
    */
  final case class EventTs(event_id: Long, user_id: Long,
      event_type: String, sec: Long, event_ts: java.sql.Timestamp)

  /** The chosen representative of one (user, type, minute) window. */
  final case class WindowFirst(user_id: Long, event_type: String,
      minute: Long, event_id: Long, sec: Long)

  /** Default lateness horizon: a year — effectively the unbounded
    * exact-parity mode for bounded replay fixtures, while still giving
    * the query a watermark so state CAN expire on truly long streams.
    */
  val DefaultLatenessSec: Long = 365L * 24 * 3600

  def firstPerWindow(events: Dataset[EventRow],
      latenessSec: Long = DefaultLatenessSec): Dataset[WindowFirst] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .withColumn("event_ts", timestamp_seconds(col("sec")))
      .withWatermark("event_ts", s"$latenessSec seconds")
      .as[EventTs]
      .groupByKey(e => (e.user_id, e.event_type, e.sec / 60L))
      .flatMapGroupsWithState[WindowFirst, WindowFirst](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String, Long), es: Iterator[EventTs],
         state: org.apache.spark.sql.streaming.GroupState[WindowFirst]) =>
          if (state.hasTimedOut) {
            // watermark passed this window's end: the representative is
            // final (already emitted on its last update) — drop state
            state.remove()
            Iterator.empty
          } else {
            val incoming = es.minBy(e => (e.sec, e.event_id))
            val best = state.getOption match {
              case Some(cur) if cur.sec < incoming.sec ||
                  (cur.sec == incoming.sec && cur.event_id <= incoming.event_id) =>
                cur
              case _ => WindowFirst(key._1, key._2, key._3,
                incoming.event_id, incoming.sec)
            }
            state.update(best)
            // expire once the watermark passes the window end. A
            // non-late row's window end is strictly above the current
            // watermark; the max() is belt-and-braces so the call can
            // never throw for a row an earlier Spark version admitted
            val windowEndMs = (key._3 + 1) * 60000L
            state.setTimeoutTimestamp(
              math.max(windowEndMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(best)
          }
      }
  }
}
