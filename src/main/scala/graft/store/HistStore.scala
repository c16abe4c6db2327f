package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Sketches

/** Persisted decimal-histogram quantile store — the quantile member of
  * the persisted-sketch quartet (HLL cardinality, Count-Min frequency,
  * Bloom membership via [[graft.pipeline.Sketches.bloomBits]] tables,
  * quantiles here): per-batch (key, sign, digits, prefix) bucket counts
  * on disk, folded on read, so "p50/p99 of this metric, stream-to-date"
  * costs a scan of a bounded bucket table — never a rescan or re-sort of
  * raw history — with DDSketch-style ≤10% relative error
  * ([[Sketches.histSketch]]).
  *
  * Bucket counts ADD on merge, so the store rides [[BatchLedger]]'s
  * single-file marker protocol for exactly-once admission, half-landed
  * detection/repair, and guard-preserving compaction — the identical
  * contract as [[CmStore]]. `meta/` pins (key_col, value_col).
  */
final class HistStore(val dir: String, spark: SparkSession) {

  private val Dims = Seq("key", "sgn", "nd", "p2", "lo4", "hi4")

  def params: (String, String) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    (m.getAs[String]("key_col"), m.getAs[String]("value_col"))
  }

  def validBatchKeys: DataFrame =
    BatchLedger.validKeys(BatchLedger.raw(spark, dir))

  /** The folded bucket table over fully-landed batches only. */
  def cells: DataFrame =
    BatchLedger.foldValid(BatchLedger.raw(spark, dir), Dims)

  /** Quantile bounds from the stored buckets (see
    * [[Sketches.histQuantiles]]): (key, q, n, qlo4, qhi4) in signed 1e-4
    * fixed-point units.
    */
  def quantiles(qs: Seq[Double]): DataFrame =
    Sketches.histQuantiles(cells, qs)

  /** Admit a batch of raw (key, value) rows under an idempotency key;
    * false = already fully landed (replay refused).
    */
  def append(batch: DataFrame, batchKey: String): Boolean = {
    require(!batchKey.isEmpty && batchKey != CmStore.FoldedKey,
      s"reserved batch key: '$batchKey'")
    val (keyCol, valueCol) = params
    if (BatchLedger.isAdmitted(BatchLedger.raw(spark, dir), batchKey))
      return false
    BatchLedger.writeBatch(spark, dir,
      Sketches.histSketch(batch, keyCol, valueCol), Dims, batchKey)
    true
  }

  /** Retire an admitted batch exactly (bucket-count linearity — see
    * [[BatchLedger.retireBatch]]); item-level deletion does not exist for
    * summed bucket counters, and a compacted-away batch needs a
    * source-replay rebuild.
    */
  def retireBatch(batchKey: String): Boolean = {
    require(batchKey != CmStore.FoldedKey,
      s"'$batchKey' is the folded history, not an admission batch; " +
        "deleting compacted history is a source-replay rebuild")
    BatchLedger.retireBatch(spark, dir, batchKey)
  }

  def validate(): Boolean = BatchLedger.validate(BatchLedger.raw(spark, dir))

  def repair(): Unit = BatchLedger.repair(spark, dir)

  def compact(): Unit =
    BatchLedger.compact(spark, dir, Dims, CmStore.FoldedKey)
}

object HistStore {

  /** Build (overwrite) the store at `dir` from an initial batch. */
  def build(spark: SparkSession, dir: String, df: DataFrame, keyCol: String,
            valueCol: String, batchKey: String = "build"): HistStore = {
    import spark.implicits._
    Seq((keyCol, valueCol)).toDF("key_col", "value_col")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    BatchLedger.writeBatch(spark, dir,
      Sketches.histSketch(df, keyCol, valueCol),
      Seq("key", "sgn", "nd", "p2", "lo4", "hi4"), batchKey,
      SaveMode.Overwrite)
    new HistStore(dir, spark)
  }
}
