package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale training-data pipelines
  * (BASELINE.json north star): exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine. All are pure DataFrame programs:
  *
  *  - exact:      one shuffle on the content fingerprint;
  *  - ngram/minhash: candidate generation is an inverted-index / LSH-bucket
  *    self-join — work is proportional to bucket sizes, never |docs|²;
  *  - at 100 TB the bucket join shuffles on (band, key) and skewed buckets
  *    (boilerplate shingles) are handled by AQE skew-join; the verification
  *    join only touches candidate pairs.
  */
object Dedup {

  /** Exact dedup via content-hash groupBy: one row per distinct normalized
    * text, with the surviving (minimum) id and the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), charFold(normText(col(textCol))).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_dups"))

  /** All-pairs n-gram Jaccard over word `n`-gram shingle sets, via an
    * inverted-index self-join on shingles (never a cross join). Returns
    * (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val shd = docs.select(col(idCol).as("doc_id"),
        explode(shingleSet(col(textCol), n)).as("shingle"))
      .cache() // referenced 4x below (sizes + both join sides)
    val sizes = shd.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = shd.alias("x")
      .join(shd.alias("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    val jac = common
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
    jac.where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash + LSH near-duplicate pairs: shingle → minhash signature →
    * banded bucket join for candidates → exact-Jaccard verification on the
    * candidate pairs only. With 128 hashes / 32 bands of 4, the probability
    * of missing a pair at jaccard 0.8 is (1-0.8^4)^32 ≈ 5e-8.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                      threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val base = docs
      .select(col(idCol).as("doc_id"), shingleSet(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .cache() // signature input + verification join sides
    // signature via explode + 128 min-aggregates: keeps the whole stage in
    // codegen (a single 128-slot array<transform> expression tree trips the
    // 64KB generated-method limit and falls back to interpretation, ~30x slower)
    val elems = base.select(col("doc_id"), explode(hashAll(col("sh"))).as("h"))
    val minExprs = (0 until numHashes).map { i =>
      min((lit(coeffA(i)) * col("h") + lit(coeffB(i))) % HashMod).as(s"mh_$i")
    }
    val sig = elems.groupBy("doc_id")
      .agg(minExprs.head, minExprs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("mh"))
    val bandRows = sig.select(col("doc_id"),
      posexplode(bandKeys(col("mh"), bands, rowsPerBand)).as(Seq("band", "key")))
    val candidates = bandRows.alias("x")
      .join(bandRows.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    // verify on the true shingle sets (strings, not hashes — immune to hash
    // collisions), candidate pairs only
    val withSets = candidates
      .join(base.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("c").cast("double") / (size(col("sha")) + size(col("shb")) - col("c")))
    withSets.where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature rows (doc_id, hi, mh): the `numHashes`-slot signature
    * exploded to one row per slot — the exact hash family is replayed by the
    * DuckDB oracle, so the signature itself (not just the final pair set) is
    * cross-engine checked. Same explode + per-slot min-aggregate shape as
    * [[minhashLshPairs]] (a single giant array expression would trip the
    * 64KB codegen limit).
    */
  def minhashSignatureRows(docs: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, numHashes: Int = 128): DataFrame = {
    val elems = docs.select(col(idCol).as("doc_id"),
      explode(hashAll(shingleSet(col(textCol), n))).as("h"))
    val minExprs = (0 until numHashes).map { i =>
      min((lit(coeffA(i)) * col("h") + lit(coeffB(i))) % HashMod).as(s"mh_$i")
    }
    elems.groupBy("doc_id").agg(minExprs.head, minExprs.tail: _*)
      .select(col("doc_id"), posexplode(
        array((0 until numHashes).map(i => col(s"mh_$i")): _*)).as(Seq("hi", "mh")))
  }

  /** Per-document SimHash over the token multiset: token → polynomial hash →
    * per-bit ±1 vote → sign bit. 30 bits (token hashes are < 2^30).
    * One explode + one groupBy with 30 codegen'd conditional sums.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val th = tok.withColumn("h", charFold(col("tok")))
    val votes = (0 until SimHashBits).map { i =>
      sum(when(shiftright(col("h"), i) % 2 === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val agg = th.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sim = (0 until SimHashBits).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-duplicate pairs with Hamming distance <= maxDist, using
    * banded LSH over the simhash bits (pigeonhole: distance <= maxDist means
    * at least one of maxDist+1 bands matches exactly) + bit_count verify.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sim = simhash(docs, idCol, textCol)
    val nBands = maxDist + 1
    val bandBits = SimHashBits / nBands // 30/4 = 7 bits per band (last gets rest)
    val bandCols = (0 until nBands).map { b =>
      val lo = b * bandBits
      val width = if (b == nBands - 1) SimHashBits - lo else bandBits
      struct(lit(b).as("band"),
        (shiftright(col("simhash"), lo) % (1L << width)).as("key"))
    }
    // cache: the self-join's probe and broadcast sides would otherwise EACH
    // recompute the token-explode + signature aggregation (a broadcast
    // exchange can't reuse a shuffle exchange, so nothing is shared)
    val bands = sim.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .cache()
    bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(expr("x.simhash").bitwiseXOR(expr("y.simhash"))).as("dist"))
      // verify BEFORE dedup: bit_count is a codegen'd map-side filter, so the
      // distinct only shuffles surviving pairs (~1% of banded candidates on
      // near-dup-dense corpora), not every bucket collision
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Dedup-cluster canonicalization — the step AFTER pair generation: group
    * near-duplicate pairs into clusters and pick one keeper (minimum id)
    * per cluster. Semantics = `rounds` iterations of min-label propagation
    * over the undirected pair graph (exact connected components when every
    * cluster's diameter <= rounds — true for near-dup clusters, which are
    * cliques-ish; the bounded recurrence is also what a SQL oracle can
    * replay exactly). Each round is one shuffle on the node id; lineage is
    * cut per round. Returns (doc_id, keeper_id) for every doc appearing in
    * a pair.
    */
  def clusterKeepers(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b", rounds: Int = 6): DataFrame = {
    val sym = pairs.select(col(idA).as("u"), col(idB).as("v"))
      .unionByName(pairs.select(col(idB).as("u"), col(idA).as("v")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("u").as("doc_id"))
      .distinct().withColumn("lbl", col("doc_id"))
      .localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      val neighborMin = sym
        .join(labels.select(col("doc_id").as("v2"), col("lbl").as("vlbl")),
          col("v") === col("v2"))
        .groupBy(col("u")).agg(min(col("vlbl")).as("nlbl"))
      labels = labels
        .join(neighborMin, col("doc_id") === col("u"), "left_outer")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("doc_id"), col("lbl").as("keeper_id"))
  }

  /** Benchmark-contamination detection: documents sharing at least one word
    * `n`-gram with a (small) benchmark/eval set — the decontamination filter
    * every pretraining pipeline runs before training. Inverted-index
    * semi-join through the shingle space: the benchmark's distinct shingles
    * broadcast (eval sets are tiny next to the corpus), so the corpus scan
    * is one map-side join + aggregation, no all-pairs work.
    * Returns (doc_id, n_shared = distinct shared shingles).
    */
  def benchmarkOverlap(docs: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchTextCol: String,
                       n: Int = 8): DataFrame = {
    val ds = docs.select(col(idCol).as("doc_id"),
      explode(shingleSet(col(textCol), n)).as("sh"))
    val bs = broadcast(bench
      .select(explode(shingleSet(col(benchTextCol), n)).as("bsh")).distinct())
    ds.join(bs, col("sh") === col("bsh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
  }

  /** Embedding-cosine near-duplicate pairs (threshold on exact cosine).
    * Brute-force blocked self-join; the LSH-bucketed scale path is
    * [[Similarity.annLsh]].
    */
  def embeddingCosinePairs(embs: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.45): DataFrame = {
    val v = embs.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", sqrt(Similarity.dot(col("vec"), col("vec"))))
      .where(col("nrm") > 0) // zero vectors: cosine undefined (NaN sorts high)
    v.alias("a").join(v.alias("b"), col("a.vid") < col("b.vid"))
      .withColumn("cos",
        Similarity.dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")))
      .where(col("cos") >= threshold)
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        round(col("cos"), 4).as("cosine"))
  }
}
