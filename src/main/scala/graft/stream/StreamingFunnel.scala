package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed funnel input event. */
final case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

/** Per-user funnel progress carried across micro-batches: the stage
  * reached so far and the epoch-millis timestamp at which it was reached.
  */
final case class FunnelState(stage: Int, reachedAt: Long)

/** A stage-advance emission. */
final case class FunnelAdvance(user_id: Long, stage: Int, ts: Timestamp)

/** The ordered conversion funnel as a continuous query — the streaming
  * twin of the batch `TimeSeries.funnelStages` (`evt_funnel` gate): per
  * user, advance to step i when an event of steps(i) arrives AT OR AFTER
  * the time step i-1 was reached, emitting one row per stage advance.
  *
  * Equivalence to the batch definition holds for in-order (event-time)
  * delivery: the batch funnel chains earliest completions (t_i = min ts of
  * step i at-or-after t_{i-1}), and a greedy time-ordered scan reaches
  * exactly those minima by induction. Each micro-batch's events are sorted
  * by (ts, event_type) before folding, so arbitrary within-batch arrival
  * order is fine; CROSS-batch late data (an earlier-step event surfacing
  * after the state advanced past it) cannot retract an advance — the
  * standard streaming-funnel approximation, bounded by the watermark.
  *
  * State is one [[FunnelState]] per user still mid-funnel — O(active
  * keys); completed funnels drop their state immediately, and the
  * event-time timeout reaps users who stall before finishing.
  */
object StreamingFunnel {

  def advances(events: Dataset[FunnelEvent], steps: Seq[String],
               watermarkDelay: String, idleTimeoutMs: Long): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        process(steps, idleTimeoutMs))
  }

  private def process(steps: Seq[String], idleTimeoutMs: Long)(
      userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelAdvance] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val out = scala.collection.mutable.ArrayBuffer[FunnelAdvance]()
    // arbitrary arrival order within the batch; the fold needs time order,
    // with same-instant events in STEP order so a view+click at the same
    // ts advances both stages exactly as the batch min-chain does
    def stepIdx(t: String): Int = {
      val i = steps.indexOf(t); if (i < 0) Int.MaxValue else i
    }
    val evs = events.toArray
      .sortBy(e => (e.ts.getTime, stepIdx(e.event_type)))
    var cur = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    evs.foreach { e =>
      if (cur.stage < steps.length && e.event_type == steps(cur.stage) &&
          e.ts.getTime >= cur.reachedAt) {
        cur = FunnelState(cur.stage + 1, e.ts.getTime)
        out += FunnelAdvance(userId, cur.stage, e.ts)
      }
    }
    if (cur.stage >= steps.length) state.remove() // funnel complete
    else {
      state.update(cur)
      val base = if (cur.reachedAt == Long.MinValue)
        evs.lastOption.map(_.ts.getTime).getOrElse(0L) else cur.reachedAt
      // clamp to strictly-after-watermark: when a batch doesn't advance the
      // stage (e.g. repeated step-0 events while waiting for step 1), the
      // stale reachedAt base can fall at or before the current watermark and
      // GroupState rejects the timestamp (killing the query); the clamp
      // keeps the reap as-early-as-allowed instead
      state.setTimeoutTimestamp(math.max(base + idleTimeoutMs,
        state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }
}
