package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.charFold

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is irreproducible across runs and engines —
  * useless for auditable dataset construction. Both operators here derive
  * the sampling decision from a polynomial hash of the row id, so the same
  * rows are selected on every run, on any engine (the DuckDB oracle replays
  * the identical fold).
  *
  * Scale: `hashPercent` is a map-side filter (no shuffle, pushes nothing —
  * but prunes before any downstream shuffle). `stratifiedTopK` shuffles once
  * on the stratum key; per-stratum state is a k-row heap (row_number over a
  * window), never the full stratum.
  */
object Sampling {

  /** Hash of the id column used as the (deterministic) randomness source. */
  private def idHash(idCol: Column): Column = charFold(idCol.cast("string"))

  /** Deterministic Bernoulli-ish sample: keeps rows whose id-hash lands in
    * the lowest `percent` of the hash space mod 100.
    */
  def hashPercent(df: DataFrame, idCol: Column, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100)
    df.where(idHash(idCol) % 100 < percent)
  }

  /** Deterministic stratified sample: exactly min(k, |stratum|) rows per
    * stratum, selected in id-hash order (pseudorandom but reproducible),
    * ties broken by id.
    */
  def stratifiedTopK(df: DataFrame, strataCol: Column, idCol: Column,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(idHash(idCol), idCol)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}
