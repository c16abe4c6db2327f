package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental-triangle store — the admission-time pattern
  * ([[DedupIndexStore]], [[AnnIndexStore]], [[SketchStore]],
  * [[CorpusStore]]) applied to the triangle census: the canonical
  * undirected edge set lives as parquet clustered by endpoint, the exact
  * triangle total lives as a 1-row meta table, and admitting a batch of
  * edges costs the MARGINAL [[graft.graph.GraphOps.triangleDeltaCanonical]]
  * wedge join (∝ Σ min-degree over truly-new edges) plus a batch-sized
  * append — never a recount, and never the O(m) canonicalize+checkpoint
  * floor the one-shot `triangleDelta` face pays to materialize its seen
  * side (measured ~20 s of the sf1 delta, SCALE.md round-8: that floor is
  * exactly what this store amortizes into the build).
  *
  * Layout under `dir`:
  *   - `edges/` (u, v): canonical (u < v, distinct, loop-free)
  *     packed-vertex edges, repartitioned by `u` at build/compact so the
  *     delta's wedge probe starts from endpoint-clustered files;
  *   - `meta/` one row (n_edges, n_triangles): the exact census, paid once
  *     at build and maintained exactly by every admission.
  *
  * Idempotent re-admission: already-stored edges are anti-joined away
  * inside the delta core, so replaying a batch admits 0 edges and adds 0
  * triangles — the crash-replay story. The edges append and the meta swap
  * are two steps (same contract as [[CorpusStore.append]]): a crash
  * between them leaves the count behind the edges; [[validate]] detects
  * it and [[repair]] re-censuses from the stored edges (the data is the
  * source of truth).
  */
final class TriangleStore(val dir: String, spark: SparkSession) {

  /** The stored canonical undirected edge set. */
  def edges: DataFrame = StoreCompaction.read(spark, s"$dir/edges")

  /** (n_edges, n_triangles) — the maintained exact census. */
  def stats: (Long, Long) = {
    val m = StoreCompaction.read(spark, s"$dir/meta").head()
    (m.getAs[Long]("n_edges"), m.getAs[Long]("n_triangles"))
  }

  /** Admit a batch of kind-tagged edges: compute the exact triangle delta
    * against the stored graph, append the truly-new canonical edges, and
    * update the census. Returns (truly-new edges, triangle delta).
    */
  def admit(newEdges: DataFrame): (Long, Long) = {
    // the stored edge set stays a LAZY parquet read (round-13): both of
    // its consumers inside the delta core (the anti-join's checkpoint and
    // the adjacency checkpoint) evaluate EAGERLY before the append below
    // mutates the table, and a second pruned columnar scan is cheaper
    // than materializing the whole table into memory blocks per admission
    val (trulyNew, delta) = graft.graph.GraphOps.triangleDeltaCanonical(
      graft.graph.GraphOps.canonicalUndirected(newEdges), edges)
    val nNew = trulyNew.count()
    if (nNew > 0) {
      val target = StoreCompaction.appendTarget(spark, s"$dir/edges")
      trulyNew.repartition(col("u"))
        .write.mode(SaveMode.Append).parquet(target)
      spark.catalog.refreshByPath(target)
      val (e0, t0) = stats
      import spark.implicits._
      StoreCompaction.swapIn(spark, s"$dir/meta",
        Seq((e0 + nNew, t0 + delta)).toDF("n_edges", "n_triangles"))
    }
    (nNew, delta)
  }

  /** Retire a batch of kind-tagged edges (the DETACH-delete face: when
    * the incremental reindex deletes a file, its call edges must leave
    * the census): the triangles destroyed by removing edge set R from
    * graph G are EXACTLY the triangles created by adding R to G \ R, so
    * the same wedge-join delta runs with the roles swapped and its result
    * is subtracted — a negative delta costing Σ min-degree over the
    * retired edges, never a recount. The surviving edge set is swapped in
    * whole (a write-only pass, the same cost class as [[compact]] and
    * crash-safe under the two-rename protocol; a crash between the swap
    * and the meta update leaves the count ahead of the edges, which
    * [[validate]] detects and [[repair]] re-censuses). Returns (edges
    * actually retired, triangles removed); edges not present are ignored
    * (idempotent — a replayed retirement removes nothing).
    */
  def retire(oldEdges: DataFrame): (Long, Long) = {
    // lazy store read for the same eager-consumers reason as [[admit]]:
    // present and survivors are both checkpointed before the swap mutates
    val stored = edges
    val present = graft.graph.GraphOps.canonicalUndirected(oldEdges)
      .join(stored, Seq("u", "v"), "left_semi")
      .localCheckpoint(true)
    val nGone = present.count()
    if (nGone == 0) return (0L, 0L)
    val survivors = stored.join(present, Seq("u", "v"), "left_anti")
      .localCheckpoint(true) // consumed by the delta AND the swap
    val (_, delta) = graft.graph.GraphOps.triangleDeltaCanonical(
      present, survivors)
    StoreCompaction.swapIn(spark, s"$dir/edges",
      survivors.repartition(col("u")))
    val (e0, t0) = stats
    import spark.implicits._
    StoreCompaction.swapIn(spark, s"$dir/meta",
      Seq((e0 - nGone, t0 - delta)).toDF("n_edges", "n_triangles"))
    (nGone, delta)
  }

  /** Recount from the stored edges and compare with the maintained census;
    * true = intact.
    */
  def validate(): Boolean = {
    val (e, t) = stats
    // enumerateTriangles materializes its input itself (round-13)
    edges.count() == e &&
      graft.graph.GraphOps.enumerateTriangles(edges).count() == t
  }

  /** Rebuild the census from the stored edges — recovery for a
    * half-applied admission (crash between the edges append and the meta
    * swap). Full-census cost; the exceptional path.
    */
  def repair(): Unit = {
    import spark.implicits._
    val stored = edges.localCheckpoint(true)
    StoreCompaction.swapIn(spark, s"$dir/meta",
      Seq((stored.count(),
        graft.graph.GraphOps.enumerateTriangles(stored).count()))
        .toDF("n_edges", "n_triangles"))
  }

  /** Re-cluster accumulated appends by endpoint (each admission lands its
    * own file set; after many the wedge probe's scan opens ~N small files
    * per cluster). Results identical; offline like the other stores.
    */
  def compact(): Unit =
    StoreCompaction.rewrite(spark, s"$dir/edges")(_.repartition(col("u")))
}

object TriangleStore {

  /** Build (overwrite) the store from a kind-tagged edge table: canonical
    * edges + the one-time exact census.
    */
  def build(spark: SparkSession, dir: String, edges: DataFrame): TriangleStore = {
    val canon = graft.graph.GraphOps.canonicalUndirected(edges)
      .localCheckpoint(true)
    StoreCompaction.swapIn(spark, s"$dir/edges",
      canon.repartition(col("u")))
    import spark.implicits._
    StoreCompaction.swapIn(spark, s"$dir/meta",
      Seq((canon.count(),
        graft.graph.GraphOps.enumerateTriangles(canon).count()))
        .toDF("n_edges", "n_triangles"))
    new TriangleStore(dir, spark)
  }
}
