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
  * CM counters ADD, so a replayed batch would double-count. The store
  * therefore owns the replay guard and makes each admission atomic:
  *
  *  - `batches/` (batch_key, j, bucket, cnt): one parquet FILE per
  *    admission (coalesce(1)) carrying the batch's ≤ depth·width cells
  *    PLUS one marker row (j = -1, bucket = -1, cnt = nCells). A parquet
  *    file is readable only once its footer is written, so a crash
  *    mid-append leaves either nothing or a file whose marker count
  *    disagrees with its cell count — [[validate]] catches both
  *    directions and [[repair]] drops the half-landed batch, after which
  *    the replay guard re-admits it (exactly-once across crashes).
  *  - `meta/` one row (item_col, depth, width), immutable after build —
  *    a mismatched-family merge is an error, not silent garbage.
  *
  * [[compact]] folds accumulated batches into a single one (estimates
  * unchanged by linearity), bounding the read amplification of long
  * admission histories.
  */
final class CmStore(val dir: String, spark: SparkSession) {

  def params: (String, Int, Int) = {
    val m = spark.read.parquet(s"$dir/meta").head()
    (m.getAs[String]("item_col"), m.getAs[Int]("depth"),
      m.getAs[Int]("width"))
  }

  private def raw: DataFrame = StoreCompaction.read(spark, s"$dir/batches")

  /** Keys of fully-landed batches: marker present AND cell count agrees
    * with it. Half-landed appends fail one of the two.
    */
  def validBatchKeys: DataFrame =
    raw.groupBy("batch_key")
      .agg(sum(when(col("j") === -1, col("cnt"))).as("marked"),
        sum(when(col("j") =!= -1, 1L).otherwise(0L)).as("actual"))
      .where(col("marked") === col("actual"))
      .select("batch_key")

  /** The folded counter table over fully-landed batches only. */
  def cells: DataFrame =
    raw.join(broadcast(validBatchKeys), Seq("batch_key"), "left_semi")
      .where(col("j") =!= -1)
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))

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
    if (validBatchKeys.where(col("batch_key") === batchKey).limit(1)
        .count() > 0) return false
    CmStore.writeBatch(spark, dir,
      Sketches.countMin(batch, itemCol, depth, width), batchKey)
    true
  }

  /** Marker/cell agreement for every stored batch; false = a half-landed
    * append is present (its cells are already excluded from [[cells]]).
    */
  def validate(): Boolean =
    raw.select(countDistinct("batch_key")).head().getLong(0) ==
      validBatchKeys.count()

  /** Drop half-landed batches (the only invalid state an append crash can
    * leave). The surviving table is swapped in whole; the dropped keys'
    * next [[append]] re-admits them.
    */
  def repair(): Unit =
    StoreCompaction.swapIn(spark, s"$dir/batches",
      raw.join(broadcast(validBatchKeys), Seq("batch_key"), "left_semi")
        .coalesce(1))

  /** Fold the admission history into one batch (estimates unchanged by
    * linearity); admitted keys are retained in `keys/` so the replay
    * guard survives compaction.
    */
  def compact(): Unit = {
    val keys = validBatchKeys.collect().map(_.getString(0))
    val folded = cells.withColumn("batch_key", lit(CmStore.FoldedKey))
      .select("batch_key", "j", "bucket", "cnt")
    // keep guard rows: zero-cell marker batches for each retained key
    import spark.implicits._
    val guards = keys.filterNot(_ == CmStore.FoldedKey).toSeq
      .map(k => (k, -1, -1, 0L)).toDF("batch_key", "j", "bucket", "cnt")
    val nCells = folded.count()
    val marker = Seq((CmStore.FoldedKey, -1, -1, nCells))
      .toDF("batch_key", "j", "bucket", "cnt")
    StoreCompaction.swapIn(spark, s"$dir/batches",
      folded.unionByName(marker).unionByName(guards).coalesce(1))
  }
}

object CmStore {

  /** Reserved key the folded history lands under after [[CmStore.compact]]. */
  val FoldedKey = "__folded"

  private def writeBatch(spark: SparkSession, dir: String, sketch: DataFrame,
                         batchKey: String,
                         mode: SaveMode = SaveMode.Append): Unit = {
    import spark.implicits._
    val cellsRows = sketch.select(lit(batchKey).as("batch_key"), col("j"),
      col("bucket"), col("cnt"))
    val n = sketch.count()
    val marker = Seq((batchKey, -1, -1, n))
      .toDF("batch_key", "j", "bucket", "cnt")
    cellsRows.unionByName(marker).coalesce(1)
      .write.mode(mode).parquet(s"$dir/batches")
  }

  /** Build (overwrite) the store at `dir` from an initial batch. */
  def build(spark: SparkSession, dir: String, df: DataFrame, itemCol: String,
            depth: Int = 4, width: Int = 2048,
            batchKey: String = "build"): CmStore = {
    require(depth >= 1 && depth <= 16 && width >= 16,
      s"unreasonable sketch shape: $depth x $width")
    import spark.implicits._
    Seq((itemCol, depth, width)).toDF("item_col", "depth", "width")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    writeBatch(spark, dir,
      Sketches.countMin(df, itemCol, depth, width), batchKey,
      SaveMode.Overwrite)
    new CmStore(dir, spark)
  }
}
