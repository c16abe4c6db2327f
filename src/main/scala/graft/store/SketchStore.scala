package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable-sketch store — the admission-time pattern
  * ([[DedupIndexStore]], [[AnnIndexStore]], [[CorpusStore]]) applied to
  * CARDINALITY tracking: per-group DataSketches HLL sketches stored as
  * binary columns, so "distinct users per source, corpus-to-date" costs
  * one sketch-merge of today's batch against yesterday's nGroups-row
  * table — never a recount of history. This is the property exact
  * distinct counts fundamentally lack (exact distinct state is
  * O(distinct values); the sketch is O(2^lgK) per group, mergeable, with
  * the standard ~1.6%/√(2^lgK) relative error at lgK = 12 default).
  *
  * Built on Spark's native DataSketches functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` — codegen-friendly, no UDF).
  * HLL register state is a max over per-item hashes, so estimates are
  * insertion-order-independent: an incremental build (N appends) lands on
  * the IDENTICAL estimates as a one-shot build over the union — asserted
  * by spec, and the property that makes the store trustworthy
  * operationally.
  *
  * Layout under `dir`: `sketches/` (group, sk binary); `meta/` one row
  * (group_col, value_col, lg_k) validated on append so a mismatched merge
  * (different lgK family) is an error, not silent garbage.
  */
final class SketchStore(val dir: String, spark: SparkSession) {

  def sketches: DataFrame = StoreCompaction.read(spark, s"$dir/sketches")

  def params: (String, String, Int) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    (m.getAs[String]("group_col"), m.getAs[String]("value_col"),
      m.getAs[Int]("lg_k"))
  }

  /** Per-group estimated distinct count from the stored sketches. */
  def estimates: DataFrame =
    sketches.select(col("group"),
      hll_sketch_estimate(col("sk")).as("n_distinct_est"))

  /** Merge a new batch into the store: sketch the batch per group, union
    * with the stored sketches (hll_union_agg over the concatenation —
    * groups new to this batch appear, existing groups merge registers),
    * swap the nGroups-row table in atomically.
    */
  def append(batch: DataFrame): Unit = {
    val (g, v, lgK) = params
    val bs = SketchStore.sketchOf(batch, g, v, lgK)
    val merged = sketches.unionByName(bs)
      .groupBy("group").agg(hll_union_agg(col("sk")).as("sk"))
    StoreCompaction.swapIn(spark, s"$dir/sketches", merged.coalesce(1))
  }

  /** DELETION contract: HLL cannot delete — registers are a MAX-fold over
    * per-item hashes, and lowering a register would forget every other
    * item that set it, so neither item- nor batch-level retirement exists
    * by construction (contrast [[CmStore.retireBatch]], whose counters
    * subtract). The deletion path is this rebuild: re-sketch the SURVIVING
    * rows (replayed from the authoritative source the sketches summarize)
    * under the stored parameters and swap the table whole. Identical
    * estimates to a fresh [[SketchStore.build]] over the same survivors
    * (register state is insertion-order-independent — asserted by spec).
    */
  def rebuild(survivors: DataFrame): Unit = {
    val (g, v, lgK) = params
    StoreCompaction.swapIn(spark, s"$dir/sketches",
      SketchStore.sketchOf(survivors, g, v, lgK).coalesce(1))
  }
}

object SketchStore {

  private[store] def sketchOf(df: DataFrame, groupCol: String,
                              valueCol: String, lgK: Int): DataFrame =
    df.groupBy(col(groupCol).cast("string").as("group"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))

  /** Build (overwrite) the sketch store at `dir`. */
  def build(spark: SparkSession, dir: String, df: DataFrame,
            groupCol: String, valueCol: String,
            lgK: Int = 12): SketchStore = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of DataSketches range: $lgK")
    StoreCompaction.swapIn(spark, s"$dir/sketches",
      sketchOf(df, groupCol, valueCol, lgK).coalesce(1))
    import spark.implicits._
    Seq((groupCol, valueCol, lgK)).toDF("group_col", "value_col", "lg_k")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    new SketchStore(dir, spark)
  }
}
