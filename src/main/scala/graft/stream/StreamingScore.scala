package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Dsir

/** Continuous DSIR importance scoring of a document stream — the streaming
  * face of the batch `dsir_weights` gate, for ingest-time data selection of
  * a training-data feed.
  *
  * The model is fitted ONCE on a static reference corpus
  * ([[Dsir.fitModelArray]] — `buckets` doubles, a deployable artifact) and
  * rides into the stream as a literal lookup table, so per-event scoring is
  * a single stateless column expression: no stream-side aggregation, no
  * state store, no watermark needed, and the scorer composes with the other
  * ingest operators ([[StreamingDedup]], repetition/quality verdicts)
  * unchanged. This mirrors how DSIR deploys in production: the expensive
  * fit is an offline batch job, the selection decision is a cheap online
  * filter.
  */
object StreamingScore {

  /** Adds `dsir_logw` to a streaming document frame, scored against the
    * model fitted on `staticCorpus`. `keepAbove` (optional) filters the
    * stream to documents scoring above the threshold — the online
    * selection decision.
    */
  def dsirStream(docs: DataFrame, staticCorpus: DataFrame,
                 idCol: String, textCol: String, targetPred: Column,
                 buckets: Int = 1024,
                 keepAbove: Option[Double] = None): DataFrame = {
    val modelArr = Dsir.fitModelArray(staticCorpus, idCol, textCol,
      targetPred, buckets)
    // coalesce to 0.0 so null/token-less documents score like the batch
    // path (withImportance) instead of being silently dropped by keepAbove
    val scored = docs.withColumn("dsir_logw",
      coalesce(Dsir.scoreAgainst(modelArr, col(textCol)), lit(0.0)))
    keepAbove.fold(scored)(t => scored.where(col("dsir_logw") > t))
  }
}
