package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.store.KmvStore

/** Continuous distinct-cardinality tracking — the streaming face of
  * [[graft.store.KmvStore]]: each micro-batch sketches map-side and
  * merges into the persisted ≤ k-row synopsis. Bottom-k union is
  * idempotent (like Bloom's bit-OR and HLL's register max, unlike the
  * additive CM/histogram counters), so replayed batches change nothing
  * and no batch ledger is needed.
  */
object StreamingKmv {

  def writer(rows: DataFrame, dir: String): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          new KmvStore(dir, batch.sparkSession).admit(batch)
        ()
      }

  def start(rows: DataFrame, dir: String,
            triggerMs: Long = 1000L): StreamingQuery =
    writer(rows, dir).trigger(Trigger.ProcessingTime(triggerMs)).start()
}
