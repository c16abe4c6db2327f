package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.store.CorpusStore

/** Continuous curated-corpus publishing — the streaming face of
  * [[graft.store.CorpusStore]]: each micro-batch of curated documents is
  * admitted into the published store via [[CorpusStore.append]] (parquet
  * append inside the STABLE id-hash shards + an nShards-row manifest
  * merge), so a downstream trainer's loader sees a corpus that only ever
  * grows, shard-stably, with an always-consistent manifest.
  *
  * This is `foreachBatch`, not a streaming file sink, deliberately: the
  * manifest merge must be transactional with the batch (the file sink
  * can't co-update a second table), and append-within-partitionBy needs
  * the batch-scoped writer. Batch id is ignored — appends are
  * content-deterministic, and replaying a batch after a crash re-appends
  * the same rows (dedup upstream of publish is the exactly-once story,
  * same as every parquet-append pipeline; the manifest stays consistent
  * because it merges the batch census it just wrote).
  *
  * The store must exist (one-time [[CorpusStore.write]], possibly empty)
  * before the stream starts — the shard count is read from its meta.
  */
object StreamingPublish {

  /** Writer publishing each micro-batch of `docs` into the store at `dir`.
    * Start with `.start()`; compose upstream curation (StreamingDedup,
    * quality verdicts) before calling.
    */
  def writer(docs: DataFrame, dir: String, idCol: String,
             textCol: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          CorpusStore.append(batch.sparkSession, dir, batch, idCol, textCol)
        ()
      }

  /** Convenience: start publishing with a processing-time trigger. */
  def start(docs: DataFrame, dir: String, idCol: String, textCol: String,
            triggerMs: Long = 1000L): StreamingQuery =
    writer(docs, dir, idCol, textCol)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
}
