package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for pretraining-batch construction: assign documents to
  * consecutive fixed-token-budget packs.
  *
  * Semantics: within each shard, documents are taken in deterministic id
  * order and laid end-to-end on a token tape; pack `p` is the tape interval
  * [p·budget, (p+1)·budget). A document belongs to the pack where it starts
  * (`pack_offset` = its start position within that pack), so a pack
  * overflows by at most one document — the standard boundary-aligned
  * approximation of greedy packing, and exactly what a downstream
  * splitter/truncater consumes. True greedy (reset-remainder) packing needs
  * running state that a window cannot express; the tape formulation is an
  * exclusive-prefix-sum — one shuffle on the shard key, any scale.
  */
object Packing {

  def sequentialPacks(docs: DataFrame, shardCol: Column, idCol: Column,
                      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__start", sum(tokensCol).over(w) - tokensCol)
      .withColumn("pack_id", floor(col("__start") / budget))
      .withColumn("pack_offset", col("__start") - col("pack_id") * budget)
      .drop("__start")
  }
}
