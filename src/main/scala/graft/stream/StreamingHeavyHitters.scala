package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.pipeline.Sketches
import graft.store.CmStore

/** Continuous heavy-hitter tracking — the streaming composition of the
  * round's frequency primitives: each micro-batch (1) merges into the
  * persisted Count-Min counters ([[CmStore.append]] under the batch id —
  * exactly-once), and (2) contributes its per-partition Misra-Gries
  * candidates to a persisted candidate set (append + fold; a SUPERSET by
  * the MG guarantee, so unioning per-batch candidates preserves it: any
  * item that is φ-heavy over the whole stream is φ-heavy in at least one
  * partition of at least one batch it appears in... strictly, of the
  * batch-partition pieces its stream is split into — which is exactly the
  * additive-frequency argument applied to the finer partition).
  *
  * [[topK]] then answers "current heavy items" at any moment from the two
  * bounded tables alone — CM estimates over the candidate set — with NO
  * replay of stream history and no stream-side state. Estimates are
  * one-sided (CM never undercounts), so the answer is a superset of the
  * true φ-heavy set with estimate error bounded by the sketch shape; an
  * exact confirmation pass over raw history stays available offline
  * ([[Sketches.heavyHitters]]).
  *
  * Candidate-set growth is bounded: ≤ k·partitions per batch, folded to
  * DISTINCT items on every write, and prunable at read time by the CM
  * estimate threshold.
  */
object StreamingHeavyHitters {

  /** Start (or reuse) the state layout under `dir`: a [[CmStore]] at
    * `dir/cm` and a candidate parquet at `dir/cands`. If a store already
    * exists (its `meta` is present) it is REOPENED, never rebuilt —
    * accumulated counters and candidates survive a process restart; pass a
    * fresh `dir` to start from empty.
    */
  def init(spark: SparkSession, dir: String, itemCol: String,
           depth: Int = 4, width: Int = 2048): (CmStore, String) = {
    import spark.implicits._
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/cm/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cm =
      if (fs.exists(metaPath)) new CmStore(s"$dir/cm", spark)
      else {
        val built = CmStore.build(spark, s"$dir/cm",
          Seq.empty[String].toDF(itemCol), itemCol, depth, width)
        Seq.empty[String].toDF("item")
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/cands")
        built
      }
    (cm, s"$dir/cands")
  }

  /** Writer folding each micro-batch into the counters + candidate set.
    * `mgK` bounds per-partition candidate memory (support 1/mgK per
    * batch-partition piece). `keyPrefix` namespaces the idempotency keys:
    * batch ids are monotonic across restarts only under a fixed
    * `checkpointLocation`, so distinct query instances feeding one store
    * must use distinct prefixes (see [[StreamingCm.writer]]).
    */
  def writer(rows: DataFrame, dir: String, itemCol: String,
             mgK: Int = 256,
             keyPrefix: String = "stream"): DataStreamWriter[Row] =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, dir, itemCol, mgK, s"${keyPrefix}_$id")
      }

  /** One micro-batch's fold — candidates FIRST: duplicate candidate rows
    * are harmless (topK distincts), but a lost candidate is unrecoverable.
    * If the CM append committed and THEN the process crashed before the
    * candidate write, a replayed batch would see append()==false and that
    * batch's Misra-Gries candidates would be dropped forever, breaking the
    * superset guarantee. Writing candidates before the idempotency check
    * means a replay only re-appends already-present rows.
    */
  private[graft] def processBatch(batch: DataFrame, dir: String,
                                  itemCol: String, mgK: Int,
                                  batchKey: String): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val st = new CmStore(s"$dir/cm", spark)
      val items = batch.select(col(itemCol).as("item"))
        .where(col("item").isNotNull)
      Sketches.mgCandidates(items, mgK)
        .write.mode(SaveMode.Append).parquet(s"$dir/cands")
      st.append(batch, batchKey)
    }

  def start(rows: DataFrame, dir: String, itemCol: String, mgK: Int = 256,
            keyPrefix: String = "stream",
            triggerMs: Long = 1000L): StreamingQuery =
    writer(rows, dir, itemCol, mgK, keyPrefix)
      .trigger(Trigger.ProcessingTime(triggerMs)).start()

  /** Current heavy items at support `phi`: CM estimates over the candidate
    * set, thresholded at ⌈φ·N⌉ with N from the counters (row-0 sum). A
    * superset of the true φ-heavy set (CM never undercounts; MG never
    * drops a heavy item).
    */
  def topK(spark: SparkSession, dir: String, phi: Double): DataFrame = {
    val st = new CmStore(s"$dir/cm", spark)
    val n = st.totalItems
    val thresh = math.ceil(phi * n).toLong.max(1L)
    val cands = spark.read.parquet(s"$dir/cands").distinct()
    st.estimate(cands, "item")
      .where(col("est") >= thresh)
      .withColumn("n_total", lit(n))
  }
}
