package graft
import org.apache.spark.sql.functions._

/** Dump formatted physical plans for gate queries (plan-shape audit: check
  * pushdown, broadcast choices, exchange reuse, codegen coverage).
  *
  * Usage: runMain graft.ExplainAudit [queryName...]  (default: a spot set)
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "explain")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    graft.functions.VectorExpressions.register(spark)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s5_scan_pushdown", "join_revenue_by_nation",
        "q04_file_definitions", "dd_minhash_lsh", "dsir_weights",
        // round-8 representatives
        "g_kcore", "srch_bm25_indexed", "evt_anomalies", "evt_resample",
        // round-9 representatives
        "srch_bm25_retire", "g_tri_retire", "mm_phash_pairs", "evt_seasonal",
        "ann_pq_topk", "ann_ivfpq_topk", "tok_pack_greedy",
        "td_heavy_hitters", "sk_cm_estimate", "sk_cm_store",
        "sk_bloom_filter", "sk_quantile_hist", "td_collocations",
        // round-10: the COMPOSED curation DAG (stages 1-6 as one plan)
        "e2e_curated_plan",
        // round-10 additions
        "samp_token_budget", "ann_filtered_topk", "tok_wordpiece_encode",
        "tok_unigram_encode", "sk_kmv_store")
    names.foreach { name =>
      println(s"===== $name")
      val df =
        if (name == "e2e_curated_plan") e2eCuratedPlan(spark, d)
        else SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }

  /** The e2e curation pipeline's composed pre-publish plan (stages 1-6 of
    * [[graft.pipeline.CurationPipeline]]) over the testdata corpus —
    * audited as ONE DataFrame so stage-boundary plan pathologies
    * (cartesian products, unpushed filters, redundant exchanges) are
    * visible across stage seams, not just within each operator.
    */
  private def e2eCuratedPlan(spark: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame = {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_audit_idx_" +
      ProcessHandle.current().pid()
    val idx = graft.store.DedupIndexStore.build(spark, idxDir,
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    graft.pipeline.CurationPipeline.curatedPlan(
      docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
      benchmark = docs.where(col("doc_id") < 10), benchTextCol = "text",
      dsirTarget = col("source").isin("src0", "src1", "src2", "src3", "src4"),
      index = idx, cfg = graft.pipeline.CurationPipeline.Config())
  }
}
