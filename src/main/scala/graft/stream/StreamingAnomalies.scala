package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.TimeSeries

/** Continuous robust anomaly flagging — the streaming twin of the batch
  * [[TimeSeries.anomalies]] gate, in the [[StreamingScore]] deployment
  * shape: the med/MAD baseline is FIT OFFLINE on a reference slice
  * (periodically refit as a batch job — the baseline SHOULD move slowly;
  * a baseline that followed the stream would let a burst of outliers
  * drag its own cut, exactly what the median/MAD choice exists to
  * prevent) and rides into the stream as a stream-static broadcast join,
  * so per-event scoring is one map-side expression: no stream-side
  * aggregation, no state store, no watermark.
  *
  * Scoring is formula-identical to the batch face (modified z-score,
  * z = 0.6745 (x − med) / MAD, |z| > k flags, MAD-0 keys unscorable,
  * same round-to-4 discipline), so a flagged event carries the same
  * (med, mad, z) the batch pass would assign it under the reference
  * baseline.
  */
object StreamingAnomalies {

  private def esc(name: String) =
    col("`" + name.replace("`", "``") + "`")

  /** The deployable baseline artifact: one (key, med, mad) row per key of
    * the reference slice, MAD-0 keys dropped (unscorable).
    */
  def fitBaseline(reference: DataFrame, keyCol: String,
                  valueCol: String): DataFrame = {
    val v = esc(valueCol)
    val k = esc(keyCol)
    val med = reference.groupBy(k.as("__graft_k"))
      .agg(percentile(v, lit(0.5)).as("med"))
    reference.join(med, k === col("__graft_k")).drop("__graft_k")
      .groupBy(k.as(keyCol))
      .agg(percentile(abs(v - col("med")), lit(0.5)).as("mad"),
        first(col("med")).as("med"))
      .where(col("mad") > 0)
      .select(esc(keyCol), col("med"), col("mad"))
  }

  /** Flag anomalous events in a stream against a fitted baseline: keys
    * absent from the baseline (unseen or MAD-0) flag nothing, matching
    * the batch face's unscorable contract. Output schema == the batch
    * face: (key, id, value, med, mad, z).
    */
  def flagged(events: DataFrame, baseline: DataFrame, keyCol: String,
              idCol: String, valueCol: String, k: Double = 3.5): DataFrame = {
    val v = esc(valueCol)
    events.join(broadcast(baseline), Seq(keyCol))
      .withColumn("z",
        round(lit(0.6745) * (v - col("med")) / col("mad"), 4))
      .where(abs(col("z")) > k)
      .select(esc(keyCol), esc(idCol), v,
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
        col("z"))
  }
}
