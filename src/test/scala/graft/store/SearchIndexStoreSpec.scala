package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Persisted BM25 index: store-path ranking equals the full-corpus batch
  * path across the append seam, query-term reads push down to the
  * postings scan, and compaction preserves results.
  */
class SearchIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  test("indexed BM25 equals the batch path; term filter pushes down; " +
    "compaction preserves the ranking") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val terms = Seq("spark", "join", "window", "fast")
    val batch = graft.pipeline.Search
      .bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq

    val dir = Files.createTempDirectory("graft-bm25").toString + "/idx"
    val st = SearchIndexStore.build(spark, dir,
      docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
    st.append(docs.where(col("doc_id") % 2 =!= 0), "doc_id", "text")
    assert(st.validate())

    def ranked = st.topK(terms, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(ranked == batch, s"index path diverged:\n$ranked\nvs\n$batch")

    // the query's term lookup reaches the parquet scan as a pushed filter
    val plan = st.postings.where(col("term").isin(terms: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term filter not pushed down:\n$plan")

    st.compact()
    assert(ranked == batch && st.validate())
  }
}
