package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed input event. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Open-session state carried across micro-batches (epoch millis). */
final case class OpenSession(start: Long, lastTs: Long, n: Long, sum: Double)

/** One closed session. */
final case class SessionOut(user_id: Long, session_start: Timestamp,
                            n_events: Long, sum_value: Double)

/** Gap-based sessionization as a continuous query — the streaming twin of
  * the batch `t2_sessionize` gate (lag + cumulative-sum windows).
  *
  * Arbitrary keyed state via `flatMapGroupsWithState` (SURVEY §2.6; the
  * reference has no event-time streaming — this is part of the
  * beyond-reference streaming surface): per user, an open session
  * accumulates until the gap elapses. Sessions close two ways:
  *
  *  - in-batch/cross-batch: a new event more than `gapMs` after the open
  *    session's last event closes it (emitted immediately, Append mode);
  *  - by timeout: when the event-time watermark passes lastTs + gapMs the
  *    state times out and the session is emitted.
  *
  * State is one [[OpenSession]] per active key — O(active users), not
  * O(events); the watermark bounds how long a silent key stays resident.
  */
object StreamingSessionize {

  def sessions(events: Dataset[SessionEvent], gapMs: Long,
               watermarkDelay: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(process(gapMs))
  }

  private def process(gapMs: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    if (state.hasTimedOut) {
      state.getOption.foreach(s =>
        out += SessionOut(userId, new Timestamp(s.start), s.n, s.sum))
      state.remove()
    } else {
      // batch arrival order is arbitrary; gap logic needs time order
      val evs = events.toArray.sortBy(_.ts.getTime)
      var cur = state.getOption.orNull
      evs.foreach { e =>
        val t = e.ts.getTime
        if (cur == null) cur = OpenSession(t, t, 1, e.value)
        else if (t - cur.lastTs > gapMs) {
          out += SessionOut(userId, new Timestamp(cur.start), cur.n, cur.sum)
          cur = OpenSession(t, t, 1, e.value)
        } else cur = OpenSession(cur.start, t, cur.n + 1, cur.sum + e.value)
      }
      if (cur != null) {
        state.update(cur)
        // clamped like StreamingFunnel: with a small gap, lastTs + gapMs can
        // trail the watermark once it advances past the batch's events, and
        // GroupState throws on a non-future timeout timestamp
        state.setTimeoutTimestamp(math.max(cur.lastTs + gapMs,
          state.getCurrentWatermarkMs() + 1))
      }
    }
    out.iterator
  }
}
