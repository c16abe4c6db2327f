package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Sketches

/** Persisted Bloom membership store — the admission-time face of
  * [[graft.pipeline.Sketches.bloomBits]]: the seen-id set of an arbitrary
  * history compresses to a ≤ k·m-row set-bit table on disk, and "might we
  * have seen this id before" is a zero-shuffle map over any new batch
  * ([[Sketches.bloomProbe]]) — the prefilter in front of the exact
  * anti-join every incremental-ingest pipeline pays.
  *
  * The interesting CONTRAST to [[CmStore]]/[[HistStore]]: bit-OR is
  * idempotent (bits is a SET union, like HLL's register max), so replayed
  * batches change nothing and the store needs NO [[BatchLedger]] — admit
  * is one distinct-union swap, crash-safe under the two-rename protocol
  * alone. One sketch family, two admission disciplines, each matched to
  * its merge algebra.
  */
final class BloomStore(val dir: String, spark: SparkSession) {

  def params: (String, Int, Int) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    (m.getAs[String]("item_col"), m.getAs[Int]("k"), m.getAs[Int]("width"))
  }

  /** The stored set-bit table (bit: long). */
  def bits: DataFrame = StoreCompaction.read(spark, s"$dir/bits")

  /** Admit a batch: union its bits in (idempotent — replays no-op). */
  def admit(batch: DataFrame): Unit = {
    val (itemCol, k, width) = params
    StoreCompaction.swapIn(spark, s"$dir/bits",
      bits.unionByName(Sketches.bloomBits(batch, itemCol, k, width))
        .distinct().coalesce(1))
  }

  /** Zero-shuffle maybe-seen tagging of a new batch. */
  def probe(batch: DataFrame): DataFrame = {
    val (itemCol, k, width) = params
    Sketches.bloomProbe(batch, itemCol, bits, k, width)
  }

  /** DELETION contract: a Bloom filter cannot delete — the set-bit table
    * is an OR-fold, and clearing a bit would un-see every OTHER item that
    * hashed to it, so neither item- nor batch-level retirement exists by
    * construction (contrast [[CmStore.retireBatch]], whose counters
    * subtract). The deletion path is this rebuild: re-sketch the SURVIVING
    * items (replayed from the authoritative source — the corpus /
    * [[CorpusStore]] the filter fronts) under the stored parameters and
    * swap the bit table whole. Bit-identical to a fresh [[BloomStore.build]]
    * over the same survivors (asserted by spec).
    */
  def rebuild(survivors: DataFrame): Unit = {
    val (itemCol, k, width) = params
    StoreCompaction.swapIn(spark, s"$dir/bits",
      Sketches.bloomBits(survivors, itemCol, k, width).coalesce(1))
  }
}

object BloomStore {

  /** Build (overwrite) the store at `dir` from the initial seen set. */
  def build(spark: SparkSession, dir: String, df: DataFrame, itemCol: String,
            k: Int = 3, width: Int = 4096): BloomStore = {
    require(k >= 1 && k <= 16 && width >= 16,
      s"unreasonable filter shape: $k x $width")
    import spark.implicits._
    Seq((itemCol, k, width)).toDF("item_col", "k", "width")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    StoreCompaction.swapIn(spark, s"$dir/bits",
      Sketches.bloomBits(df, itemCol, k, width).coalesce(1))
    new BloomStore(dir, spark)
  }
}
