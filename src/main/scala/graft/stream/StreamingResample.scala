package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed input event (same shape as [[SessionEvent]]). */
final case class ResampleEvent(user_id: Long, ts: Timestamp, value: Double)

/** Per-key resample state: per-bucket partial aggregates that the
  * watermark has not yet sealed, plus the LOCF carry (last emitted bucket
  * and its value). Buckets are epoch-seconds / bucketSeconds.
  */
final case class ResampleState(pending: Map[Long, (Long, Double)],
                               lastBucket: Long, lastV: Double,
                               hasLast: Boolean)

/** One emitted grid row — schema-identical to the batch face. */
final case class ResampleOut(user_id: Long, bucket_start: Long,
                             n_events: Long, v: Double, gap_filled: Boolean)

/** Continuous fixed-grid resampling with LOCF gap fill — the streaming
  * twin of the batch [[graft.pipeline.TimeSeries.resample]] gate. LOCF
  * needs ORDERED per-key emission (a gap row's value is the previous
  * grid row's), so this is arbitrary keyed state via
  * `flatMapGroupsWithState` (the [[StreamingSessionize]] discipline), not
  * a stateless column map:
  *
  *  - events accumulate into per-(key, bucket) partial aggregates;
  *  - a bucket is SEALED once the event-time watermark passes its end
  *    (no more events can land in it); sealed buckets emit in bucket
  *    order, preceded by gap rows carrying the previous value — exactly
  *    the batch grid, which runs from each key's first to last active
  *    bucket (trailing gaps after the newest sealed activity wait until
  *    a later active bucket seals, because the batch face emits no grid
  *    past the key's last event);
  *  - an event-time timeout re-wakes silent keys so buckets seal on
  *    watermark progress, not only on new data.
  *
  * State is O(unsealed buckets per key) — bounded by the watermark delay
  * over the bucket width, the same per-key-bounded contract as the batch
  * face's per-key windows.
  */
object StreamingResample {

  def resampled(events: Dataset[ResampleEvent], bucketSeconds: Long,
                watermarkDelay: String): Dataset[ResampleOut] = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ResampleState, ResampleOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        process(bucketSeconds))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def process(bucketSeconds: Long)(
      userId: Long, events: Iterator[ResampleEvent],
      state: GroupState[ResampleState]): Iterator[ResampleOut] = {
    val st0 = state.getOption.getOrElse(
      ResampleState(Map.empty, 0L, 0.0, hasLast = false))
    // fold the batch's events into the pending per-bucket aggregates
    var pending = st0.pending
    events.foreach { e =>
      val b = Math.floorDiv(e.ts.getTime / 1000L, bucketSeconds)
      val (n, s) = pending.getOrElse(b, (0L, 0.0))
      pending = pending.updated(b, (n + 1, s + e.value))
    }
    // seal buckets the watermark has passed; emit them in order with LOCF
    // gap rows in between
    val wmBucket = Math.floorDiv(
      state.getCurrentWatermarkMs() / 1000L, bucketSeconds)
    val (ripe, open) = pending.partition(_._1 < wmBucket)
    val out = scala.collection.mutable.ArrayBuffer[ResampleOut]()
    var lastBucket = st0.lastBucket
    var lastV = st0.lastV
    var hasLast = st0.hasLast
    ripe.keys.toSeq.sorted.foreach { b =>
      if (hasLast) {
        var g = lastBucket + 1
        while (g < b) {
          out += ResampleOut(userId, g * bucketSeconds, 0L, lastV,
            gap_filled = true)
          g += 1
        }
      }
      val (n, s) = ripe(b)
      val v = round4(s / n)
      out += ResampleOut(userId, b * bucketSeconds, n, v, gap_filled = false)
      lastBucket = b; lastV = v; hasLast = true
    }
    if (open.isEmpty && !hasLast) state.remove()
    else {
      // the LOCF carry outlives the pending buckets: a key that goes
      // silent and reactivates later must gap-fill from its last emitted
      // value, exactly like the batch grid — so the carry (one row per
      // ever-active key, the same O(keys) floor LOCF itself implies)
      // stays resident with no timeout once everything is sealed
      state.update(ResampleState(open, lastBucket, lastV, hasLast))
      if (open.nonEmpty) {
        // wake when the watermark passes the earliest open bucket's end
        // so sealing tracks watermark progress even on silent keys
        val wake = (open.keys.min + 1) * bucketSeconds * 1000L
        state.setTimeoutTimestamp(
          math.max(wake, state.getCurrentWatermarkMs() + 1))
      }
    }
    out.iterator
  }
}
