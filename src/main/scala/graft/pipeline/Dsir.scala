package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{charFold, shingles, tokens}

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every document by how much more likely its hashed-n-gram profile is
  * under a TARGET distribution (the data you want more of) than under the
  * RAW corpus distribution, then keep the top-k.
  *
  * Model: bag of hashed n-grams (unigrams + bigrams folded into `buckets`
  * buckets), per-bucket probabilities with add-1 smoothing fitted to the
  * target subset and to the whole corpus; a document's importance is
  *   log w(d) = Σ_g∈d ( ln p_target[b(g)] − ln p_raw[b(g)] )
  * summed over every n-gram OCCURRENCE (equivalently Σ_b cnt_d[b]·Δln p).
  * The paper draws Gumbel noise for the resample; here selection is the
  * deterministic top-k on (rounded weight, id) so the same documents are
  * chosen on every run and engine — same auditability contract as
  * [[Sampling]], and the DuckDB oracle replays the identical fold hash.
  *
  * Scale shape (the reason DSIR works at 100 TB where trained-classifier
  * selection needs GPU inference): both fitted models are just `buckets`
  * rows — broadcast them. The pipeline is one explode + groupBy(bucket)
  * pass to fit (map-side partial aggregation does the heavy lifting), then
  * a map-side broadcast join + one groupBy(id) to score. No shuffle ever
  * carries more than one row per (doc, n-gram occurrence), and the only
  * wide exchange is the per-doc score aggregation.
  */
object Dsir {

  /** unigram + bigram stream of the normalized text (empty array when the
    * doc has no tokens — `shingles` yields null below 2 tokens).
    */
  private def grams(textCol: Column): Column = {
    val toks = tokens(textCol)
    concat(toks, coalesce(shingles(toks, 2), array()))
  }

  /** (id, bucket) row per n-gram occurrence. */
  private def occurrences(docs: DataFrame, idCol: String, textCol: String,
                          targetPred: Column, buckets: Int): DataFrame =
    docs.select(col(idCol), targetPred.cast("boolean").as("__tgt"),
        explode(grams(col(textCol))).as("__g"))
      .select(col(idCol), col("__tgt"),
        (charFold(col("__g")) % buckets).as("__b"))

  /** Per-bucket add-1-smoothed log-prob difference ln p_t − ln p_r, fitted
    * from `occ`: `buckets`-row DataFrame (__b, __dlp). Stays lazy — totals
    * ride in via a 1-row cross join instead of a driver collect.
    */
  private def model(occ: DataFrame, buckets: Int): DataFrame = {
    val perBucket = occ.groupBy("__b").agg(
      count(lit(1)).as("__rc"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"))
    val totals = perBucket.agg(
      sum("__rc").as("__rtot"), sum("__tc").as("__ttot"))
    perBucket.crossJoin(broadcast(totals)).select(col("__b"),
      (log(col("__tc") + 1) - log(col("__ttot") + buckets)
        - log(col("__rc") + 1) + log(col("__rtot") + buckets)).as("__dlp"))
  }

  /** Adds `dsir_logw` (importance log-weight, 4-decimal-rounded for
    * cross-engine stability; 0.0 for token-less documents) to `docs`.
    * `targetPred` marks the target subset the resample should steer toward
    * (e.g. `col("lang") === "en"`), evaluated per input row.
    */
  def withImportance(docs: DataFrame, idCol: String, textCol: String,
                     targetPred: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val occ = occurrences(docs, idCol, textCol, targetPred, buckets)
    val scores = occ.join(broadcast(model(occ, buckets)), "__b")
      .groupBy(idCol).agg(round(sum("__dlp"), 4).as("dsir_logw"))
    docs.join(scores, Seq(idCol), "left")
      .withColumn("dsir_logw", coalesce(col("dsir_logw"), lit(0.0)))
  }

  /** Deterministic importance resample: the `k` documents with the highest
    * importance weight, ties broken by id. The returned frame keeps
    * `dsir_logw` so downstream mixing can re-weight. Planned as
    * TakeOrderedAndProject (per-partition k-heaps, no global sort, no
    * single-partition window) — the global-window row_number alternative
    * funnels the corpus through one task.
    */
  def resample(docs: DataFrame, idCol: String, textCol: String,
               targetPred: Column, k: Int, buckets: Int = 1024): DataFrame =
    withImportance(docs, idCol, textCol, targetPred, buckets)
      .orderBy(col("dsir_logw").desc, col(idCol))
      .limit(k)
}
