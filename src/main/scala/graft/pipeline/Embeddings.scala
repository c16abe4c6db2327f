package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: L2
  * normalization and int8 quantization. Both are map-side transforms
  * (no shuffle) over `array<float>` columns; the arithmetic uses the
  * codegen'd dot-product expression and is replayed exactly by the
  * DuckDB oracle.
  */
object Embeddings {

  /** (id, vec, nrm) with doubles and the L2 norm; zero vectors dropped
    * (their normalization is undefined).
    */
  private def withNorm(embs: DataFrame, idCol: String, vecCol: String) =
    embs.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", sqrt(Similarity.dot(col("vec"), col("vec"))))
      .where(col("nrm") > 0)

  /** Unit-normalized vectors: (vec_id, unit array<double>). */
  def l2Normalize(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    withNorm(embs, idCol, vecCol)
      .select(col("vec_id"), transform(col("vec"), x => x / col("nrm")).as("unit"))

  /** Scalar int8 quantization of the unit vector: each dimension becomes
    * round(x / ||v|| * 127) ∈ [-127, 127]. One long row per (vec_id, dim) —
    * the exploded shape keeps the gate comparable scalar-by-scalar and is
    * also the shape a dimension-pruned columnar store wants.
    */
  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    withNorm(embs, idCol, vecCol)
      .select(col("vec_id"),
        posexplode(transform(col("vec"),
          x => round(x / col("nrm") * 127, 0).cast("int"))))
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "qval")

  /** Per-label mean embedding: one row per (label, dim). posexplode then
    * avg — map-side partial aggregation reduces every partition to
    * k·dims rows before the shuffle, so the exchange volume is independent
    * of corpus size (the 100 TB shape: a constant-width combine tree).
    */
  def centroidsByLabel(embs: DataFrame, labelCol: String, vecCol: String): DataFrame =
    embs.select(col(labelCol).cast("int").as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("label", "dim").agg(avg("x").as("centroid"))

  /** Centroids reassembled into arrays: (label, cvec array<double>). k rows
    * total — the broadcastable side of an assignment join. The transform
    * lambda is interpreted but runs over k·dims elements only.
    */
  def centroidVectors(embs: DataFrame, labelCol: String, vecCol: String): DataFrame =
    centroidsByLabel(embs, labelCol, vecCol)
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("p"))
      .select(col("label"), expr("transform(p, q -> q.centroid)").as("cvec"))

  /** One Lloyd assignment step against the per-label centroids: each vector
    * goes to its nearest centroid by squared L2, ties broken by label.
    * The distance is the expansion |v|² + |c|² − 2·v·c — three codegen'd
    * dot products, with |c|² precomputed on the k-row broadcast side, so
    * the per-row work is a single dot product against each of k centroids
    * (never a materialized difference vector). Output: (vec_id, label,
    * assigned, dist2).
    */
  def kmeansAssign(embs: DataFrame, idCol: String, labelCol: String,
                   vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = broadcast(centroidVectors(embs, labelCol, vecCol)
      .select(col("label").as("clab"), col("cvec"),
        Similarity.dot(col("cvec"), col("cvec")).as("c2")))
    val v = embs.select(col(idCol).as("vec_id"),
        col(labelCol).cast("int").as("label"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("v2", Similarity.dot(col("vec"), col("vec")))
    val scored = v.join(cents, lit(true), "cross")
      .withColumn("d2",
        col("v2") + col("c2") - lit(2.0) * Similarity.dot(col("vec"), col("cvec")))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clab"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("clab").as("assigned"),
        round(col("d2"), 4).as("dist2"))
  }
}
