package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition every pretraining data
  * pipeline runs before training: fuzzy dedup (keep the best copy of each
  * near-dup cluster), Gopher document-rule filters, repetition filters, and
  * a quality threshold, plus a funnel view auditing per-stage attrition.
  *
  * Stage order is dedup-first (published pipelines go both ways — RefinedWeb
  * filters then dedups, Dolma dedups then filters): dedup-first makes each
  * later stage's count independent of filter ordering and reuses the
  * corpus-wide cluster table the standalone dedup operators already build.
  *
  * Scale: the verdict computation is ONE pass of map-side column math per
  * document plus the dedup chain (inverted-index pair generation, bounded
  * label propagation, one window on cluster_id — no pairwise joins); the
  * funnel is a single global aggregation over the verdict booleans.
  */
object Curation {

  /** Every document with its four per-stage verdict booleans:
    * `dedup_kept` (quality-argmax survivor of its near-dup cluster),
    * `gopher_keep`, `repetition_keep`, `quality_keep` (rounded composite
    * score >= qualityMin). Downstream metric columns from each stage ride
    * along for inspection.
    */
  def withVerdicts(docs: DataFrame, idCol: String, textCol: String,
                   qualityMin: Double = 0.5,
                   blocklist: Seq[String] = Nil): DataFrame = {
    val screened =
      if (blocklist.isEmpty) docs
      else TextAnalysis.withBlocklist(docs, textCol, blocklist)
    val scored = TextAnalysis.withQuality(screened, textCol)
    val clusters = Dedup.clusterKeepers(
      Dedup.ngramJaccardPairs(docs, idCol, textCol, n = 3, threshold = 0.8))
    val deduped = Dedup.keepBest(scored, clusters, idCol, col("quality_score"))
      .withColumnRenamed("kept", "dedup_kept")
    val ruled = TextAnalysis.withGopherRules(deduped, textCol)
      .withColumnRenamed("keep", "gopher_keep")
    TextAnalysis.withRepetition(ruled, textCol)
      .withColumn("quality_keep", col("quality_score") >= qualityMin)
  }

  /** The curated corpus: documents passing ALL stages (the blocklist
    * verdict participates when a blocklist is supplied — C4 applies it
    * before everything else, and so does this: `blocklist_keep` rides from
    * [[TextAnalysis.withBlocklist]]'s map-side pass).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             qualityMin: Double = 0.5,
             blocklist: Seq[String] = Nil): DataFrame = {
    val v = withVerdicts(docs, idCol, textCol, qualityMin, blocklist)
    val base = col("dedup_kept") && col("gopher_keep") &&
      col("repetition_keep") && col("quality_keep")
    v.where(if (blocklist.isEmpty) base else col("blocklist_keep") && base)
  }

  /** Attrition funnel: (stage, n_docs) for the cumulative conjunction of
    * stage verdicts, in pipeline order. One aggregation job over the
    * verdict booleans — not one count per stage.
    */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             qualityMin: Double = 0.5): DataFrame = {
    val v = withVerdicts(docs, idCol, textCol, qualityMin)
    def cum(cs: Column*) = sum(when(cs.reduce(_ && _), 1L).otherwise(0L))
    val agg = v.agg(
      count(lit(1)).as("c0"),
      cum(col("dedup_kept")).as("c1"),
      cum(col("dedup_kept"), col("gopher_keep")).as("c2"),
      cum(col("dedup_kept"), col("gopher_keep"),
        col("repetition_keep")).as("c3"),
      cum(col("dedup_kept"), col("gopher_keep"), col("repetition_keep"),
        col("quality_keep")).as("c4"))
    agg.select(explode(array(
        struct(lit("0_all").as("stage"), col("c0").as("n_docs")),
        struct(lit("1_fuzzy_dedup").as("stage"), col("c1").as("n_docs")),
        struct(lit("2_gopher_rules").as("stage"), col("c2").as("n_docs")),
        struct(lit("3_repetition").as("stage"), col("c3").as("n_docs")),
        struct(lit("4_quality").as("stage"), col("c4").as("n_docs")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.n_docs").as("n_docs"))
  }
}
