package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{bandKeys, minhashSig, shingleSet}

/** Near-duplicate screening of an ingest stream against a STATIC historical
  * corpus — the streaming face of `graft.pipeline.Dedup.crossCorpusPairs`
  * (production shape: the admitted index refreshes per snapshot, the
  * intra-snapshot feed screens against it continuously).
  *
  * The seen side's banded MinHash index is built once as a static DataFrame
  * (in production: read from the persisted admission index, not recomputed
  * from text); every micro-batch computes signatures MAP-SIDE (the
  * codegen'd MinHashSig expression), explodes band keys, and stream-static
  * equi-joins on (band, key) — Structured Streaming plans that as a
  * per-batch join against the cached static side, no stream state at all.
  * Exact-Jaccard verification runs on the joined rows only. A pair that
  * co-buckets in several bands appears once per band; the trailing
  * `dropDuplicatesWithinWatermark` on (new_id, seen_id) collapses those
  * structural duplicates with watermark-bounded state — O(pairs per
  * window), not O(stream history).
  */
object StreamingCrossDedup {

  /** Emit (new_id, seen_id, jaccard, ts) for every stream document whose
    * n-gram Jaccard against some seen document clears `threshold`.
    */
  def pairStream(docs: DataFrame, seen: DataFrame, idCol: String,
                 textCol: String, tsCol: String, watermarkDelay: String,
                 n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val snBands = seen
      .select(col(idCol).as("seen_id"), shingleSet(col(textCol), n).as("shb"))
      .where(size(col("shb")) > 0)
      .select(col("seen_id"), col("shb"),
        posexplode(bandKeys(minhashSig(col("shb"), numHashes), bands, rowsPerBand))
          .as(Seq("band", "key")))
      .cache() // static banded index: built once, reused every micro-batch
    val stBands = docs
      .select(col(idCol).as("new_id"), col(tsCol).as("ts"),
        shingleSet(col(textCol), n).as("sha"))
      .where(size(col("sha")) > 0)
      .select(col("new_id"), col("ts"), col("sha"),
        posexplode(bandKeys(minhashSig(col("sha"), numHashes), bands, rowsPerBand))
          .as(Seq("band", "key")))
    stBands.join(snBands, Seq("band", "key")) // stream-static equi-join
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("c")))
      .where(col("jaccard") >= threshold)
      .select(col("new_id"), col("seen_id"),
        round(col("jaccard"), 4).as("jaccard"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("new_id", "seen_id")
  }

  /** The production form of [[pairStream]]: the seen side comes from the
    * PERSISTED admission index ([[graft.store.DedupIndexStore]]) instead of
    * being recomputed from text at stream start — stream start-up cost is a
    * parquet open, not a full historical shingle+sign pass. The static
    * side's file listing is pinned at query start (and cached thereafter),
    * so admission appends become visible on stream RESTART — the
    * snapshot-rotation cadence [[pairStream]]'s doc describes — and a
    * restart costs a re-list, never a rebuild.
    *
    * Two stream-static equi-joins: micro-batch band keys against the stored
    * band table (candidates), then candidates against the stored shingle
    * sets (exact-Jaccard verification) — the same two-table shape as the
    * batch `Dedup.crossCorpusPairsIndexed`. Both static sides are cached;
    * the band table arrives key-clustered from the admission-time
    * `repartition(key)` write.
    */
  def pairStreamIndexed(docs: DataFrame, index: graft.store.DedupIndexStore,
                        idCol: String, textCol: String, tsCol: String,
                        watermarkDelay: String,
                        n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                        threshold: Double = 0.8): DataFrame = {
    index.requireParams(n, numHashes, bands)
    val rowsPerBand = numHashes / bands
    val idxBands = index.bands
      .select(col("doc_id").as("seen_id"), col("band"), col("key"))
      .cache()
    val idxShingles = index.shingles
      .select(col("doc_id").as("seen_id"), col("sh").as("shb"))
      .cache()
    val stBands = docs
      .select(col(idCol).as("new_id"), col(tsCol).as("ts"),
        shingleSet(col(textCol), n).as("sha"))
      .where(size(col("sha")) > 0)
      .select(col("new_id"), col("ts"), col("sha"),
        posexplode(bandKeys(minhashSig(col("sha"), numHashes), bands, rowsPerBand))
          .as(Seq("band", "key")))
    stBands.join(idxBands, Seq("band", "key"))
      .select(col("new_id"), col("ts"), col("sha"), col("seen_id"))
      .join(idxShingles, "seen_id")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("c")))
      .where(col("jaccard") >= threshold)
      .select(col("new_id"), col("seen_id"),
        round(col("jaccard"), 4).as("jaccard"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("new_id", "seen_id")
  }
}
