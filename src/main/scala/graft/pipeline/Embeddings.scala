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
}
