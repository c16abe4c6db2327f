package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.store.HistStore

/** Continuous quantile tracking — the streaming face of
  * [[graft.store.HistStore]]: each micro-batch's (key, value) rows merge
  * into the persisted decimal-histogram buckets under the batch id as
  * idempotency key, so "p50/p99 stream-to-date" reads a bounded bucket
  * table at any moment with zero stream-side state. Bucket counts ADD, so
  * the exactly-once contract (and the keyPrefix requirement for query
  * instances with fresh checkpoints) is identical to [[StreamingCm]].
  */
object StreamingHist {

  def writer(rows: DataFrame, dir: String,
             keyPrefix: String = "stream"): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          new HistStore(dir, batch.sparkSession)
            .append(batch, s"${keyPrefix}_$id")
          ()
        }
      }

  def start(rows: DataFrame, dir: String, keyPrefix: String = "stream",
            triggerMs: Long = 1000L): StreamingQuery =
    writer(rows, dir, keyPrefix)
      .trigger(Trigger.ProcessingTime(triggerMs)).start()
}
