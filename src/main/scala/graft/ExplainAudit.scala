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
        "sk_bloom_filter", "sk_quantile_hist", "td_collocations")
    names.foreach { name =>
      println(s"===== $name")
      println(SparkEntry.queries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
