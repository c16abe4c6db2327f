package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.store.BloomStore

/** Continuous seen-set tracking — the streaming face of
  * [[graft.store.BloomStore]]: each micro-batch's ids union into the
  * persisted set-bit table. Bit-OR is idempotent per item (like HLL
  * registers, unlike the additive CM/histogram counters), so replayed
  * batches change nothing and no idempotency key or batch ledger is
  * needed — the simplest exactly-once story in the sketch family.
  */
object StreamingBloom {

  def writer(rows: DataFrame, dir: String): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          new BloomStore(dir, batch.sparkSession).admit(batch)
        ()
      }

  def start(rows: DataFrame, dir: String,
            triggerMs: Long = 1000L): StreamingQuery =
    writer(rows, dir).trigger(Trigger.ProcessingTime(triggerMs)).start()
}
