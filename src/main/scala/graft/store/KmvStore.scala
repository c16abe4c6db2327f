package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.pipeline.Sketches

/** Persisted KMV (bottom-k) synopsis store — the admission-time face of
  * [[graft.pipeline.Sketches.kmv]]: the distinct-value synopsis of an
  * arbitrary ingest history compresses to a ≤ k-row hash table on disk,
  * answering "how many distinct items has this stream ever carried" and
  * — the KMV-specific power the HLL store lacks — "how much does it
  * OVERLAP with that other stream" ([[intersect]]), without re-touching
  * raw history.
  *
  * Admission algebra: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  * bottom-k(B)) — a set-union fold like [[BloomStore]]'s bit-OR and
  * unlike the additive CM/histogram counters, so replayed batches
  * change nothing and the store needs NO [[BatchLedger]]: admit is one
  * distinct-union-limit swap, crash-safe under the two-rename protocol
  * alone.
  *
  * Scale: every admission reads the ≤ k-row stored synopsis, sketches
  * the batch (hash + distinct + per-partition k-row heaps — the
  * TakeOrderedAndProject shape, driver never sees more than k rows),
  * and swaps ≤ k rows back. Store size and admission cost are
  * O(k) regardless of history.
  */
final class KmvStore(val dir: String, spark: SparkSession) {

  def params: (String, Int) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    (m.getAs[String]("item_col"), m.getAs[Int]("k"))
  }

  /** The stored synopsis (f: long), ≤ k rows. */
  def synopsis: DataFrame = StoreCompaction.read(spark, s"$dir/synopsis")

  /** Admit a batch: bottom-k of (stored ∪ batch sketch). Idempotent —
    * replays no-op by the union algebra.
    */
  def admit(batch: DataFrame): Unit = {
    val (itemCol, k) = params
    StoreCompaction.swapIn(spark, s"$dir/synopsis",
      Sketches.kmvMerge(k, synopsis,
        Sketches.kmv(batch, itemCol, k)).coalesce(1))
  }

  /** Distinct-cardinality estimate of everything ever admitted — exact
    * below k (one row: n_kept, f_kth, est).
    */
  def cardinality: DataFrame = {
    val (_, k) = params
    Sketches.kmvCardinality(synopsis, k)
  }

  /** Intersection-cardinality estimate against another store's (or any
    * same-k) synopsis (one row: k_union, matched, est_union,
    * est_intersection).
    */
  def intersect(other: DataFrame): DataFrame = {
    val (_, k) = params
    Sketches.kmvIntersect(synopsis, other, k)
  }

  /** DELETION contract: KMV cannot delete — an item evicted from the
    * bottom-k by a later-retired item cannot be restored from the
    * synopsis, so item- and batch-level retirement don't exist by
    * construction (the [[BloomStore.rebuild]] discipline, same reason a
    * different algebra: order statistics forget what they evict). The
    * deletion path is this rebuild: re-sketch the SURVIVING items under
    * the stored parameters and swap the synopsis whole — bit-identical
    * to a fresh [[KmvStore.build]] over the same survivors (asserted by
    * spec).
    */
  def rebuild(survivors: DataFrame): Unit = {
    val (itemCol, k) = params
    StoreCompaction.swapIn(spark, s"$dir/synopsis",
      Sketches.kmv(survivors, itemCol, k).coalesce(1))
  }
}

object KmvStore {

  /** Build (overwrite) the store at `dir` from the initial item set. */
  def build(spark: SparkSession, dir: String, df: DataFrame, itemCol: String,
            k: Int = 256): KmvStore = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    import spark.implicits._
    Seq((itemCol, k)).toDF("item_col", "k")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    StoreCompaction.swapIn(spark, s"$dir/synopsis",
      Sketches.kmv(df, itemCol, k).coalesce(1))
    new KmvStore(dir, spark)
  }
}
