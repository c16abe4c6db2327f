package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.json4s._
import graft.operators.Profile
import graft.serve.EventPublisher

/** Pre-admission data-quality gate in the ingest stream — the streaming
  * face of [[graft.operators.Profile.expect]]: every micro-batch is audited
  * against the declared expectations in ONE aggregation pass (rule-count
  * rows back to the driver, never batch rows), and only batches with zero
  * rule violations are admitted; failing batches are quarantined whole to
  * a parquet side-channel (with their batch id and failing-rule summary)
  * for offline triage instead of silently contaminating the corpus.
  * Verdicts are published on the serving event bus, so an SSE client
  * observes the audit lifecycle the same way it observes indexing — the
  * role the reference's event bus plays for its indexing pipeline
  * (event-bus/src/lib.rs:47-160).
  *
  * Batch-all-or-nothing is deliberate: a drop whose census violates an
  * expectation is suspect END TO END (schema drift, upstream bug), and
  * row-level cherry-picking would mask that signal — the Deequ/`ANALYZE`
  * admission pattern. Per-row filtering belongs to the stateless quality
  * columns ([[graft.pipeline.TextAnalysis]]) composed upstream.
  *
  * Replay: admission is delegated to `admit` (idempotence is its
  * contract, e.g. [[graft.store.CorpusStore]]'s dedup-guarded ingest);
  * quarantine re-append of a replayed batch duplicates only quarantined
  * rows, which are triage data, never corpus.
  */
object StreamingExpect {

  /** Verdict of one audited micro-batch. */
  final case class BatchVerdict(batchId: Long, nRows: Long, passed: Boolean,
                                violations: Map[String, Long])

  /** Audit each micro-batch of `docs` against `rules`; admit clean batches
    * through `admit`, quarantine failing ones under `quarantineDir`
    * (columns of the batch + `__batch_id`). `onVerdict` (optional) sees
    * every batch's verdict; `bus` (optional) receives
    * `ExpectationsPassed` / `BatchQuarantined` events.
    */
  def writer(docs: DataFrame, rules: Seq[(String, Column)],
             admit: DataFrame => Unit, quarantineDir: String,
             bus: Option[EventPublisher] = None,
             onVerdict: BatchVerdict => Unit = _ => ()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // one aggregation pass; rule-count rows to the driver
          val verdicts = Profile.expect(batch, rules).collect()
          val nRows = verdicts.head.getAs[Long]("n_rows")
          val failing = verdicts.filter(!_.getAs[Boolean]("pass"))
            .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations"))
            .toMap
          val verdict = BatchVerdict(batchId, nRows, failing.isEmpty, failing)
          if (verdict.passed) {
            admit(batch)
            bus.foreach(_.publish("ExpectationsPassed",
              "batch_id" -> JLong(batchId), "n_rows" -> JLong(nRows)))
          } else {
            batch.withColumn("__batch_id",
                org.apache.spark.sql.functions.lit(batchId))
              .write.mode(SaveMode.Append).parquet(quarantineDir)
            bus.foreach(_.publish("BatchQuarantined",
              "batch_id" -> JLong(batchId), "n_rows" -> JLong(nRows),
              "violations" -> JObject(failing.toList.sortBy(_._1)
                .map { case (r, n) => r -> (JLong(n): JValue) })))
          }
          onVerdict(verdict)
        }
        ()
      }

  /** Convenience: start the audit with a processing-time trigger. */
  def start(docs: DataFrame, rules: Seq[(String, Column)],
            admit: DataFrame => Unit, quarantineDir: String,
            bus: Option[EventPublisher] = None,
            onVerdict: BatchVerdict => Unit = _ => (),
            triggerMs: Long = 1000L): StreamingQuery =
    writer(docs, rules, admit, quarantineDir, bus, onVerdict)
      .trigger(Trigger.ProcessingTime(triggerMs)).start()
}
