package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.store.TriangleStore

/** Continuous exact triangle maintenance — the streaming face of
  * [[graft.store.TriangleStore]]: each micro-batch of edges admits into
  * the persisted store (marginal wedge join over truly-new edges + a
  * batch-sized append + a 1-row census update), so "how many triangles
  * does the graph have right now" is answerable from a 1-row meta read at
  * any moment, with NO stream-side state — the same admission-time
  * discipline as [[StreamingSketch]] / [[StreamingPublish]] /
  * [[StreamingSearchIndex]].
  *
  * Replay: the store anti-joins every batch against its stored canonical
  * edges, so a crash-replayed batch admits 0 edges and changes nothing —
  * idempotent by construction, no guard needed here.
  */
object StreamingTriangles {

  /** Writer admitting each micro-batch of kind-tagged edges
    * (kind, source_id, target_id) into the store at `dir` (must exist —
    * [[TriangleStore.build]]). `onDelta` (optional) observes each batch's
    * (new-edge count, triangle delta).
    */
  def writer(edges: DataFrame, dir: String,
             onDelta: (Long, Long) => Unit = (_, _) => ()): DataStreamWriter[Row] =
    edges.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val (n, d) = new TriangleStore(dir, batch.sparkSession).admit(batch)
          onDelta(n, d)
        }
        ()
      }

  /** Convenience: start admitting with a processing-time trigger. */
  def start(edges: DataFrame, dir: String,
            onDelta: (Long, Long) => Unit = (_, _) => (),
            triggerMs: Long = 1000L): StreamingQuery =
    writer(edges, dir, onDelta).trigger(Trigger.ProcessingTime(triggerMs)).start()
}
