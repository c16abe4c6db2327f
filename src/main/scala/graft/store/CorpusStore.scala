package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.charFold

/** Curated-corpus sink — the OUTPUT face of the training-data pipeline:
  * after curation (dedup keepers, quality verdicts, split assignment), the
  * surviving documents are written as hash-sharded parquet with a
  * machine-readable manifest, the layout a downstream trainer's data
  * loader consumes shard-by-shard.
  *
  *  - Shard = deterministic id-hash mod nShards ([[graft.pipeline.Sampling]]'s
  *    engine-replayable charFold, NOT a row-order-dependent round-robin):
  *    a document's shard never changes as the corpus grows, so incremental
  *    publishes append within shards instead of reshuffling history.
  *  - `partitionBy(shard)` directories; rows sorted by doc id within each
  *    shard so re-reads are deterministic and parquet min/max stats prune
  *    id lookups.
  *  - `manifest/` (one parquet): per-shard rows + token totals, written
  *    from the SAME aggregation pass, so a loader can size epochs and
  *    sanity-check completeness without scanning the data. [[validate]]
  *    recomputes the census from the data and compares — the
  *    end-to-end-integrity check a publish job runs last.
  */
object CorpusStore {

  private def shardOf(idCol: Column, nShards: Int): Column =
    (charFold(idCol.cast("string")) % nShards).cast("int")

  /** Write `docs` (must carry `idCol`, `textCol`) sharded under `dir`.
    * Returns the manifest as a DataFrame (shard, n_docs, n_tokens).
    */
  def write(spark: SparkSession, dir: String, docs: DataFrame,
            idCol: String, textCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val sharded = docs.withColumn("shard", shardOf(col(idCol), nShards))
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(s"$dir/docs")
    val manifest = census(sharded, textCol)
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/manifest")
    import spark.implicits._
    Seq(nShards).toDF("n_shards")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    manifest
  }

  private def census(sharded: DataFrame, textCol: String): DataFrame =
    sharded.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(trim(col(textCol)), "\\s+"))
        .cast("long")).as("n_tokens"))

  /** The shard count the corpus was published with. */
  def nShards(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/meta").head().getAs[Int]("n_shards")

  /** Admit a new batch into an existing published corpus — the daily
    * incremental publish: parquet APPEND inside the (stable) id-hash
    * shards plus an incremental manifest merge. A document's shard never
    * changes as the corpus grows (the hash ignores corpus state), so
    * appends land within existing shard directories and history is never
    * rewritten; the new manifest is the per-shard SUM of the stored
    * manifest and the batch census — an nShards-row merge, NOT a recount
    * of history — swapped in atomically (write-to-sibling + rename, the
    * [[StoreCompaction]] discipline). Returns the merged manifest.
    * [[graft.stream.StreamingPublish]] is the continuous face. After many
    * admissions, [[compact]] re-clusters shard files.
    *
    * Crash contract: the docs append and the manifest merge are two steps,
    * not one transaction. A crash between them leaves the batch's rows in
    * the shards but not in the manifest — [[validate]] flags the
    * divergence, and [[repair]] rebuilds the manifest from a full recount
    * of the stored shards. Do NOT blindly replay the batch after a crash:
    * the rows are already stored, and a re-append would double them while
    * the census merges once. Replay-safe ingestion should dedup the batch
    * against stored ids first (the [[DedupIndexStore]] exact face) or gate
    * on validate() == 0 before admitting.
    */
  def append(spark: SparkSession, dir: String, docs: DataFrame,
             idCol: String, textCol: String): DataFrame = {
    val n = nShards(spark, dir)
    val sharded = docs.withColumn("shard", shardOf(col(idCol), n))
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col(idCol))
      .write.mode(SaveMode.Append).partitionBy("shard")
      .parquet(s"$dir/docs")
    val merged = manifest(spark, dir)
      .unionByName(census(sharded, textCol))
      .groupBy("shard").agg(sum("n_docs").as("n_docs"),
        sum("n_tokens").as("n_tokens"))
    StoreCompaction.swapIn(spark, s"$dir/manifest", merged.coalesce(1))
    manifest(spark, dir)
  }

  /** Re-cluster accumulated appends: rewrite the shard directories so each
    * holds a compact file set again, preserving the layout and the sorted-
    * by-id property. Results are byte-equivalent to a fresh publish.
    */
  def compact(spark: SparkSession, dir: String,
              idCol: String = "doc_id"): Unit =
    StoreCompaction.rewritePartitioned(spark, s"$dir/docs", "shard")(
      _.repartition(col("shard")).sortWithinPartitions(col(idCol)))

  def docs(spark: SparkSession, dir: String): DataFrame =
    StoreCompaction.read(spark, s"$dir/docs")

  def manifest(spark: SparkSession, dir: String): DataFrame =
    StoreCompaction.read(spark, s"$dir/manifest")

  /** Rebuild the manifest from a full recount of the stored shards — the
    * recovery path for a half-applied admission ([[append]]'s crash
    * contract): after a crash between the docs append and the manifest
    * merge, [[validate]] reports divergence and this restores agreement
    * from the data, which is the source of truth. A full shard scan — the
    * exceptional path, never the steady-state admission cost.
    */
  def repair(spark: SparkSession, dir: String, textCol: String): DataFrame = {
    StoreCompaction.swapIn(spark, s"$dir/manifest",
      census(docs(spark, dir), textCol).coalesce(1))
    manifest(spark, dir)
  }

  /** Recompute the per-shard census from the stored data and compare with
    * the manifest; returns the number of divergent shards (0 = intact).
    */
  def validate(spark: SparkSession, dir: String, idCol: String,
               textCol: String): Long = {
    val fromData = census(docs(spark, dir), textCol)
    fromData.alias("d").join(manifest(spark, dir).alias("m"),
        Seq("shard"), "full_outer")
      .where(col("d.n_docs").isNull || col("m.n_docs").isNull ||
        col("d.n_docs") =!= col("m.n_docs") ||
        col("d.n_tokens") =!= col("m.n_tokens"))
      .count()
  }
}
