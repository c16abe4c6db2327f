package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.store.SketchStore

/** Continuous cardinality tracking — the streaming face of
  * [[graft.store.SketchStore]]: each micro-batch's values merge into the
  * persisted per-group HLL sketches via [[SketchStore.append]] (one
  * register-merge against an nGroups-row table per batch), so "distinct
  * users per source, stream-to-date" is answerable at any moment from the
  * store with NO stream-side state at all — the watermark/state-residency
  * question that an exact streaming `dropDuplicates` census must answer
  * simply never arises (HLL register state is bounded at 2^lgK per group,
  * forever).
  *
  * Replay semantics: HLL insertion is idempotent per item (registers are
  * per-item maxima), so a crash-replayed batch re-merging the SAME values
  * changes nothing — stronger than the corpus sink's append-replay story,
  * and the reason a cardinality sketch is the canonical streaming
  * aggregate.
  */
object StreamingSketch {

  /** Writer merging each micro-batch of `rows` into the sketch store at
    * `dir` (must exist — one-time [[SketchStore.build]] fixes the group
    * and value columns and lgK).
    */
  def writer(rows: DataFrame, dir: String): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          new SketchStore(dir, batch.sparkSession).append(batch)
        ()
      }

  /** Convenience: start merging with a processing-time trigger. */
  def start(rows: DataFrame, dir: String,
            triggerMs: Long = 1000L): StreamingQuery =
    writer(rows, dir).trigger(Trigger.ProcessingTime(triggerMs)).start()
}
