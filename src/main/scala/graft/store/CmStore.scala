package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Sketches

/** Persisted Count-Min frequency store — the admission-time pattern
  * ([[SketchStore]], [[TriangleStore]]) applied to FREQUENCY tracking:
  * per-batch Count-Min counter tables on disk, folded on read, so "how
  * often has this item appeared, corpus-to-date" costs a broadcast probe
  * of a bounded counter table — never a rescan of history — and per-day /
  * per-source sketches roll up by cell-wise sum (the transform is linear).
  *
  * Unlike HLL registers (per-item maxima — replay-idempotent for free),
  * CM counters ADD, so a replayed batch would double-count. Admission
  * atomicity, the replay guard, half-landed-batch detection/repair, and
  * guard-preserving compaction are [[BatchLedger]]'s single-file marker
  * protocol; this class contributes the sketch shape: cells keyed by
  * (j, bucket), built by [[Sketches.countMin]], probed by
  * [[Sketches.cmEstimate]]. `meta/` holds (item_col, depth, width),
  * immutable after build — a mismatched-family merge is an error, not
  * silent garbage.
  */
final class CmStore(val dir: String, spark: SparkSession) {

  private val Dims = Seq("j", "bucket")

  def params: (String, Int, Int) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    (m.getAs[String]("item_col"), m.getAs[Int]("depth"),
      m.getAs[Int]("width"))
  }

  /** Keys of fully-landed batches (see [[BatchLedger.validKeys]]). */
  def validBatchKeys: DataFrame =
    BatchLedger.validKeys(BatchLedger.raw(spark, dir))

  /** The folded counter table over fully-landed batches only. */
  def cells: DataFrame =
    BatchLedger.foldValid(BatchLedger.raw(spark, dir), Dims)

  /** Point estimates for a candidate item set against the folded table. */
  def estimate(candidates: DataFrame, itemCol: String): DataFrame = {
    val (_, depth, width) = params
    Sketches.cmEstimate(cells, candidates, itemCol, depth, width)
  }

  /** Total items admitted: every item lands in exactly one bucket of row
    * j = 0, so the row-0 sum is N.
    */
  def totalItems: Long =
    cells.where(col("j") === 0).agg(coalesce(sum("cnt"), lit(0L)))
      .head().getLong(0)

  /** Admit a batch under an idempotency key. Returns false (no-op) when
    * the key already names a fully-landed batch — the crash-replay story:
    * foreachBatch re-delivery, or a retry after a half-landed append that
    * [[repair]] dropped, both converge to exactly-once counting.
    */
  def append(batch: DataFrame, batchKey: String): Boolean = {
    require(!batchKey.isEmpty && batchKey != CmStore.FoldedKey,
      s"reserved batch key: '$batchKey'")
    val (itemCol, depth, width) = params
    if (BatchLedger.isAdmitted(BatchLedger.raw(spark, dir), batchKey))
      return false
    BatchLedger.writeBatch(spark, dir,
      Sketches.countMin(batch, itemCol, depth, width), Dims, batchKey)
    true
  }

  /** Retire an admitted batch exactly (counter linearity — see
    * [[BatchLedger.retireBatch]]): estimates afterwards equal a store that
    * never saw the batch. ITEM-level deletion does not exist for a
    * Count-Min store by construction (cells are sums over colliding
    * items); the unit of deletion is the admission batch, and a batch
    * folded away by [[compact]] requires a source-replay rebuild instead.
    */
  def retireBatch(batchKey: String): Boolean = {
    require(batchKey != CmStore.FoldedKey,
      s"'$batchKey' is the folded history, not an admission batch; " +
        "deleting compacted history is a source-replay rebuild")
    BatchLedger.retireBatch(spark, dir, batchKey)
  }

  /** Marker/cell agreement for every stored batch; false = a half-landed
    * append is present (its cells are already excluded from [[cells]]).
    */
  def validate(): Boolean = BatchLedger.validate(BatchLedger.raw(spark, dir))

  /** Drop half-landed batches; their keys' next [[append]] re-admits. */
  def repair(): Unit = BatchLedger.repair(spark, dir)

  /** Fold the admission history into one batch (estimates unchanged by
    * linearity); admitted keys are retained as zero-cell guards so the
    * replay guard survives compaction.
    */
  def compact(): Unit =
    BatchLedger.compact(spark, dir, Dims, CmStore.FoldedKey)
}

object CmStore {

  /** Reserved key the folded history lands under after [[CmStore.compact]]. */
  val FoldedKey = "__folded"

  /** Build (overwrite) the store at `dir` from an initial batch. */
  def build(spark: SparkSession, dir: String, df: DataFrame, itemCol: String,
            depth: Int = 4, width: Int = 2048,
            batchKey: String = "build"): CmStore = {
    require(depth >= 1 && depth <= 16 && width >= 16,
      s"unreasonable sketch shape: $depth x $width")
    import spark.implicits._
    Seq((itemCol, depth, width)).toDF("item_col", "depth", "width")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    BatchLedger.writeBatch(spark, dir,
      Sketches.countMin(df, itemCol, depth, width), Seq("j", "bucket"),
      batchKey, SaveMode.Overwrite)
    new CmStore(dir, spark)
  }
}
