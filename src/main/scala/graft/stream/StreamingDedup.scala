package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{charFold, normText}

/** Continuous exact dedup of a document stream — the streaming face of the
  * batch `dd_exact` gate, for ingest-time dedup of a training-data feed.
  *
  * Each document gets the same normalized-content fingerprint the batch
  * operator uses (so batch and stream agree on what "duplicate" means);
  * `dropDuplicatesWithinWatermark` keeps first-seen rows and expires
  * fingerprint state once the watermark passes — state is O(distinct docs
  * per watermark window), not O(stream history), which is what makes this
  * runnable forever at ingest scale. Text-analysis enrichment (quality,
  * langid, token counts) composes unchanged on the deduped stream: those
  * operators are stateless column expressions, identical in batch and
  * streaming.
  */
object StreamingDedup {

  /** Deduplicate `docs` (streaming DataFrame with `textCol` and event-time
    * `tsCol`) by normalized-content fingerprint within the watermark.
    * Output carries the input columns plus the `fp` fingerprint.
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermarkDelay: String): DataFrame =
    docs
      .withColumn("fp", charFold(normText(col(textCol))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
