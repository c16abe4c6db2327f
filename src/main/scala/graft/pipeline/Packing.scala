package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Sequence packing for LLM training pipelines: map a tokenized corpus
  * onto fixed-length training sequences. Three disciplines, from the
  * cheapest approximation to the exact loader contract:
  *
  *  - [[sequentialPacks]] — boundary-aligned tape packing per shard: a
  *    document belongs to the pack where it starts on the shard's token
  *    tape, so a pack overflows by at most one document. One window
  *    cumsum per shard; the right tool when a downstream
  *    splitter/truncater absorbs the boundary document.
  *  - [[packChunks]] — GPT-style concat-and-chunk: the corpus's token
  *    stream (documents concatenated in doc-id order) is split into
  *    consecutive `seqLen`-token chunks; a document may span several
  *    chunks and a chunk several documents. Zero padding waste by
  *    construction; the output is the (doc, chunk) overlap map a loader
  *    needs to materialize chunk tensors.
  *  - [[packGreedy]] — boundary-respecting first-fit: documents are
  *    never split (truncated to `seqLen` at most); within deterministic
  *    id-hash buckets, docs are laid greedily into sequences in id
  *    order, opening a new sequence when the next doc would overflow.
  *    The bucket bound makes the sequential scan embarrassingly
  *    parallel — each bucket's packing is independent.
  *
  * Both faces are deterministic pure functions of (corpus, seqLen
  * [, buckets]) so the DuckDB oracle can replay them exactly: chunk
  * packing via a window cumulative sum, greedy packing via a recursive
  * CTE that walks each bucket row-by-row.
  *
  * Scale: packChunks's only global state is the prefix SUM of per-bucket
  * token totals — computed with ONE bounded (≤ `buckets`-row) driver
  * fold, never a single-partition window; everything else is per-bucket
  * windows and a map-side explode. packGreedy is one shuffle to bucket +
  * a linear per-partition scan. Both are O(corpus tokens) with no
  * all-pairs term anywhere.
  */
object Packing {

  /** Boundary-aligned tape packing: within each shard, documents are
    * taken in deterministic id order and laid end-to-end on a token
    * tape; pack `p` is the tape interval [p·budget, (p+1)·budget). A
    * document belongs to the pack where it STARTS (`pack_offset` = its
    * start position within that pack), so a pack overflows by at most
    * one document — the standard boundary-aligned approximation whose
    * remainder a downstream splitter/truncater consumes. An
    * exclusive-prefix-sum per shard — one shuffle on the shard key, any
    * scale.
    */
  def sequentialPacks(docs: DataFrame, shardCol: Column, idCol: Column,
                      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__start", sum(tokensCol).over(w) - tokensCol)
      .withColumn("pack_id", floor(col("__start") / budget))
      .withColumn("pack_offset", col("__start") - col("pack_id") * budget)
      .drop("__start")
  }

  /** Concat-and-chunk packing: emit one row per (document, chunk)
    * overlap with the slice of the document that lands in the chunk.
    *
    * Output columns: doc_id, chunk_id (0-based global), tok_start
    * (offset of the slice inside the document), n_slice (tokens of the
    * document in this chunk). Empty-token docs occupy no chunk and are
    * dropped. The global token order is doc-id order; `buckets` only
    * controls parallelism (the result is bucket-count-invariant because
    * bucketing is monotone in doc_id and offsets accumulate in bucket
    * order).
    */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
                 seqLen: Int, buckets: Int = 64): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tok"))
      .where(col("n_tok") > 0)
    val bounds = base.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0)) return base.sparkSession.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit(0L).as("chunk_id"),
        lit(0L).as("tok_start"), lit(0L).as("n_slice"))
    val lo = bounds.getLong(0)
    // monotone deterministic bucketing over the id range: order across
    // buckets == order within the concatenated stream
    val width = math.max(1L, (bounds.getLong(1) - lo) / buckets + 1)
    val wLoc = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base
      .withColumn("bucket", ((col("doc_id") - lo) / width).cast("long"))
      .withColumn("cum", sum("n_tok").over(wLoc))
    // bucket totals -> driver prefix fold (<= buckets rows) -> broadcast
    val totals = local.groupBy("bucket").agg(max("cum").as("btot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    val offDf = base.sparkSession.createDataFrame(offs.toSeq)
      .toDF("bucket", "boff")
    val L = seqLen.toLong
    local.join(broadcast(offDf), "bucket")
      .withColumn("start_off", col("boff") + col("cum") - col("n_tok"))
      .select(col("doc_id"), col("n_tok"), col("start_off"),
        explode(sequence(expr(s"start_off DIV $L"),
          expr(s"(start_off + n_tok - 1) DIV $L"))).as("chunk_id"))
      .withColumn("tok_start",
        greatest(lit(0L), col("chunk_id") * L - col("start_off")))
      .withColumn("n_slice",
        least(col("n_tok"), (col("chunk_id") + 1) * L - col("start_off"))
          - col("tok_start"))
      .select("doc_id", "chunk_id", "tok_start", "n_slice")
  }

  /** Boundary-respecting greedy packing: within bucket `doc_id %
    * buckets`, lay documents (token counts capped at `seqLen`) into
    * sequences in id order, opening a new sequence when the next doc
    * would overflow `seqLen`.
    *
    * Output columns: doc_id, bucket, seq_idx (0-based per bucket),
    * off_in_seq (token offset of the doc inside its sequence), n_tok
    * (capped count). The per-partition scan is the sanctioned
    * imperative case: first-fit state is inherently sequential per
    * bucket, and buckets bound the sequence — each partition does one
    * O(rows) pass over sorted input.
    */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
                 seqLen: Int, buckets: Int = 32): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val ss = docs.sparkSession
    import ss.implicits._
    val L = seqLen.toLong
    docs
      .select(pmod(col(idCol).cast("long"), lit(buckets.toLong)).as("bucket"),
        col(idCol).cast("long").as("doc_id"),
        least(size(tokens(col(textCol))).cast("long"), lit(L)).as("n_tok"))
      .where(col("n_tok") > 0)
      .as[(Long, Long, Long)]
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .mapPartitions { it =>
        var curB = Long.MinValue; var fill = 0L; var seq = 0L
        it.map { case (b, id, n) =>
          if (b != curB) { curB = b; fill = 0L; seq = 0L }
          val (sIdx, off) =
            if (fill + n > L) { seq += 1; fill = n; (seq, 0L) }
            else { val o = fill; fill += n; (seq, o) }
          (id, b, sIdx, off, n)
        }
      }
      .toDF("doc_id", "bucket", "seq_idx", "off_in_seq", "n_tok")
  }
}
