package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.store.CmStore

/** Continuous frequency tracking — the streaming face of
  * [[graft.store.CmStore]]: each micro-batch's items merge into the
  * persisted Count-Min counters via [[CmStore.append]] under the
  * micro-batch id as the idempotency key. CM counters ADD (unlike HLL's
  * per-item-max registers), so exactly-once hinges on that key: a
  * crash-replayed batch re-offers the same id, the store's guard sees a
  * fully-landed batch and no-ops, and a batch that half-landed (marker
  * missing) is excluded from reads, dropped by repair(), and re-admitted
  * cleanly on the retry. Stream-side state is ZERO — the counter table
  * (≤ depth·width per batch, folded by compact()) is the only state,
  * bounded forever.
  */
object StreamingCm {

  /** Writer merging each micro-batch of `rows` into the CM store at
    * `dir` (must exist — one-time [[CmStore.build]] fixes the item column
    * and sketch shape).
    *
    * Idempotency key = `keyPrefix` + micro-batch id. Batch ids are
    * monotonic ACROSS restarts only under a fixed `checkpointLocation`
    * (the standard foreachBatch exactly-once contract); a query started
    * with a FRESH checkpoint restarts ids at 0, so distinct query
    * instances feeding one store must use distinct prefixes — otherwise
    * the guard silently refuses their (new) batches as replays.
    */
  def writer(rows: DataFrame, dir: String,
             keyPrefix: String = "stream"): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          new CmStore(dir, batch.sparkSession)
            .append(batch, s"${keyPrefix}_$id")
          ()
        }
      }

  /** Convenience: start merging with a processing-time trigger. */
  def start(rows: DataFrame, dir: String, keyPrefix: String = "stream",
            triggerMs: Long = 1000L): StreamingQuery =
    writer(rows, dir, keyPrefix)
      .trigger(Trigger.ProcessingTime(triggerMs)).start()
}
