package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Continuous similarity serving: approximate top-k neighbors of an
  * embedding stream against the persisted IVF index
  * ([[graft.store.AnnIndexStore]]) — the streaming face of
  * `AnnIndexStore.topK`, for the "embed-then-route" ingest shape (every
  * arriving document finds its nearest corpus neighbors for dedup routing,
  * retrieval-augmented labeling, or cluster assignment).
  *
  * Streaming constraints shape the plan: rank windows are unavailable on a
  * stream, so (1) probe-CELL selection is pure column math over CENTROID
  * LITERALS — nlist is bounded, the quantizer is collected once at query
  * definition (exactly the FAISS coarse-quantizer-in-RAM shape) and each
  * row sorts its own nlist-length (distance, cid) array; (2) candidates
  * stream-static join the cell-partitioned store on cid — no stream state;
  * (3) the final top-k per query collapses in a watermarked event-time
  * window aggregation (append-mode compatible), sorting each query's
  * bounded candidate list once. Ties break on the neighbor id, matching
  * the batch `ivfProbe` exactly.
  */
object StreamingAnn {

  /** (q_id, win_start, rank, neighbor_id, cosine) per stream vector, one
    * row group per event-time window (rows emit when the watermark passes
    * the window end).
    */
  def topKStream(stream: DataFrame, index: graft.store.AnnIndexStore,
                 idCol: String, vecCol: String, tsCol: String,
                 watermarkDelay: String, windowDuration: String,
                 k: Int, nprobe: Int): DataFrame = {
    val cents: Array[(Int, Seq[Double])] = index.centroids.collect()
      .map(r => (r.getAs[Int]("cid"),
        // getAs yields a mutable ArraySeq; typedLit's encoder needs the
        // immutable Seq its TypeTag promises
        r.getAs[scala.collection.Seq[Double]]("cvec").toVector))
    val v = stream.select(col(idCol).as("q_id"),
        col(vecCol).cast("array<double>").as("q_vec"), col(tsCol).as("ts"))
      .withColumn("q_nrm", sqrt(Similarity.dot(col("q_vec"), col("q_vec"))))
      .where(col("q_nrm") > 0)
    // per-centroid similarity against literal planes; sort order (negated
    // cosine asc, cid asc) replays ivfProbe's (d desc, cid) probe ranking
    val scoredCells: Column = array(cents.map { case (cid, cv) =>
      struct(
        (-(Similarity.dot(col("q_vec"), typedLit(cv)) / col("q_nrm"))).as("nd"),
        lit(cid).as("cid"))
    }.toIndexedSeq: _*)
    val probed = v
      .withColumn("probe", slice(array_sort(scoredCells), 1, nprobe))
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("ts"),
        explode(transform(col("probe"), c => c("cid"))).as("cid"))
    val cells = index.cells.cache() // static side, reused per micro-batch
    val cand = probed.join(cells, "cid")
      .where(col("vid") =!= col("q_id"))
      .withColumn("cosine",
        Similarity.dot(col("q_vec"), col("vec")) / (col("q_nrm") * col("nrm")))
    cand.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("q_id"))
      .agg(slice(array_sort(collect_list(struct(
        (-col("cosine")).as("nc"), col("vid"), col("cosine")))), 1, k).as("top"))
      .select(col("q_id"), col("window.start").as("win_start"),
        posexplode(col("top")).as(Seq("r", "t")))
      .select(col("q_id"), col("win_start"),
        (col("r") + 1).cast("int").as("rank"),
        col("t.vid").as("neighbor_id"),
        round(col("t.cosine"), 4).as("cosine"))
  }
}
