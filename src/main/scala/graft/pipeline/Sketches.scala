package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Frequency sketches: Count-Min summaries (Cormode & Muthukrishnan 2005)
  * and Misra-Gries heavy hitters — the fixed-memory frequency family next
  * to [[graft.store.SketchStore]]'s HLL cardinality registers.
  *
  * The Count-Min sketch is a depth×width counter table: row j counts items
  * by bucket h_j(x) = ((a_j · charFold(x) + b_j) mod P) mod width, the same
  * deterministic pairwise-independent family as the MinHash slots
  * ([[TextFunctions.coeffA]]/[[coeffB]]) — so the identical sketch is
  * expressible in the DuckDB oracle and the gate hash-compares the full
  * estimate table, not just a bound bit.
  *
  * Relational shape and the 100 TB story: building is ONE map-side
  * expansion (explode of `depth` (j, bucket) pairs per item) followed by a
  * groupBy over at most depth·width keys — partial aggregation means the
  * shuffle carries the SKETCH's size per partition, never the corpus's.
  * Sketches MERGE by cell-wise sum (the transform is linear), so
  * per-partition / per-day / per-source sketches roll up without touching
  * raw history — the same admission contract as the HLL store. Estimates
  * are a broadcast join of candidates against the depth·width table.
  *
  * Error contract: est(x) ≥ true(x) always (counters only overcount);
  * est(x) ≤ true(x) + ε·N with probability 1−δ at width=⌈e/ε⌉,
  * depth=⌈ln(1/δ)⌉.
  */
object Sketches {

  /** (j, bucket) hash pairs for one item column, j in [0, depth). */
  private def cmBuckets(item: Column, depth: Int, width: Int): Column = {
    val f = TextFunctions.charFold(item)
    array((0 until depth).map { j =>
      struct(lit(j).as("j"),
        (((lit(TextFunctions.coeffA(j)) * f + lit(TextFunctions.coeffB(j)))
          % TextFunctions.HashMod) % width).cast("int").as("bucket"))
    }: _*)
  }

  /** Build the sketch: (j, bucket, cnt) — at most depth·width rows.
    * `weightCol` of None counts each row as 1 (plain frequency); pass a
    * column name to sketch a pre-aggregated weighted stream.
    */
  def countMin(df: DataFrame, itemCol: String, depth: Int, width: Int,
               weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    df.select(explode(cmBuckets(col(itemCol), depth, width)).as("jb"),
        w.as("__w"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(sum("__w").as("cnt"))
  }

  /** Merge sketches built with the same (depth, width): cell-wise sum. */
  def cmMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for a candidate item set: min over the depth rows of
    * the item's counters. The sketch (≤ depth·width rows) broadcasts; a
    * bucket no item hashed into estimates as 0.
    */
  def cmEstimate(sketch: DataFrame, candidates: DataFrame, itemCol: String,
                 depth: Int, width: Int): DataFrame =
    candidates
      .select(col(itemCol).as("item"),
        explode(cmBuckets(col(itemCol), depth, width)).as("jb"))
      .join(broadcast(sketch),
        col("jb.j") === col("j") && col("jb.bucket") === col("bucket"),
        "left_outer")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** PARTITIONED Bloom filter bit positions of an item set: k
    * deterministic hashes (the same charFold/coeff family), each into its
    * own m-bit partition (bit id = j·m + bucket), emitted as the DISTINCT
    * set-bit table — ≤ k·m rows, broadcastable, mergeable by union, and
    * expressible in the DuckDB oracle (builtin bloom_filter_agg is
    * deliberately avoided for the same reason as xxhash64 everywhere
    * else: the gate contract is cross-engine determinism).
    *
    * The 100 TB use is admission prefiltering: the seen-id set of a
    * billion-row corpus compresses to an m-row bit table; a new batch
    * probes it map-side (broadcast join) and only the maybe-seen sliver
    * pays the exact anti-join against history ([[Dedup]] incremental
    * faces). No false negatives ever (an admitted item's k bits are all
    * set by construction); false-positive rate is the PARTITIONED-filter
    * (1−e^(−n/m))^k — each hash owns its own m-bit partition, slightly
    * above the classic shared-array (1−e^(−kn/m))^k at equal total bits,
    * in exchange for the oracle-expressible (j, bucket) layout.
    */
  def bloomBits(df: DataFrame, itemCol: String, k: Int = 3,
                m: Int = 4096): DataFrame =
    df.select(explode(cmBuckets(col(itemCol), k, m)).as("jb"))
      .select((col("jb.j") * m + col("jb.bucket")).cast("long").as("bit"))
      .distinct()

  /** Probe: tag each row of `batch` with maybe_seen = all k of its bits
    * are set in `bits`. Definitely-unseen rows (maybe_seen = false) can
    * skip the exact membership check entirely. No false negatives by
    * construction; false-positive rate (1−e^(−n/m))^k.
    *
    * ZERO-shuffle by design: the bit table is bounded at k·m rows (its
    * whole point), so it collects to the driver and each of the k checks
    * compiles to a codegen'd `InSet` membership test — the probe is a
    * pure map over the batch, no explode, no groupBy, no width-of-batch
    * shuffle. (An earlier explode + broadcast-join + group-back shape
    * re-shuffled every batch column; the collect is the same bounded cost
    * the broadcast already paid.)
    */
  def bloomProbe(batch: DataFrame, itemCol: String, bits: DataFrame,
                 k: Int = 3, m: Int = 4096): DataFrame = {
    val bitSet = bits.select(col("bit")).collect().map(_.getLong(0)).toSeq
    val f = TextFunctions.charFold(col(itemCol))
    val cond =
      if (bitSet.isEmpty) lit(false)
      else (0 until k).map { j =>
        ((((lit(TextFunctions.coeffA(j)) * f + lit(TextFunctions.coeffB(j)))
          % TextFunctions.HashMod) % m).cast("long") + j.toLong * m)
          .isInCollection(bitSet)
      }.reduce(_ && _)
    batch.withColumn("maybe_seen", cond)
  }

  // -------------------------------------------------------- quantile hist

  /** Decimal histogram quantile sketch — the quantile member of the
    * sketch family (cardinality: HLL store; frequency: Count-Min;
    * membership: Bloom; quantiles: this), shaped like DDSketch (Masson et
    * al. 2019): logarithmic buckets give bounded RELATIVE error with a
    * bounded bucket count, and the sketch merges by summing bucket
    * counts. Where DDSketch buckets by ⌈log_γ x⌉ (float log — not
    * reproducible across engines' libm), this uses DECIMAL-STRING
    * bucketing: values quantize to 1e-4 fixed point (the repo-wide
    * discipline), and a bucket is (sign, digit-count, first-2-digits) of
    * the magnitude — pure string/integer ops, bit-identical in any
    * engine, ≤ ~3.4k buckets per group regardless of data. Relative
    * error is ≤ 10% by construction (bucket width / lower bound ≤ 1/10)
    * for magnitudes of at least 10 quanta, i.e. |value| ≥ 1e-3; below
    * that (single-digit quantized magnitudes, nd=1 buckets like [1,2) in
    * 1e-4 units) the bound is ABSOLUTE instead: error < 1e-4.
    *
    * Returns (key, sgn, nd, p2, lo4, hi4, cnt): the value's quantized
    * magnitude lies in [lo4, hi4); signed fixed-point bounds are
    * sgn·lo4/sgn·hi4. All bounds stay in 1e-4 integer units — no float
    * leaves the pipeline.
    */
  def histSketch(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val s = abs(col("iv")).cast("string")
    val d = length(s)
    val p2 = substring(s, 1, 2).cast("long")
    df.select(col(keyCol).as("key"),
        round(col(valueCol).cast("double") * 10000).cast("long").as("iv"))
      .where(col("iv").isNotNull)
      .select(col("key"), signum(col("iv")).cast("int").as("sgn"),
        d.as("nd"), p2.as("p2"),
        concat(p2.cast("string"),
          repeat(lit("0"), greatest(d - 2, lit(0)))).cast("long").as("lo4"),
        concat((p2 + 1).cast("string"),
          repeat(lit("0"), greatest(d - 2, lit(0)))).cast("long").as("hi4"))
      .groupBy("key", "sgn", "nd", "p2", "lo4", "hi4")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram sketches over the same (key, value) family. */
  def histMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("key", "sgn", "nd", "p2", "lo4", "hi4")
      .agg(sum("cnt").as("cnt"))

  /** Quantile bounds from the sketch: for each q, the bucket containing
    * the ⌈q·n⌉-th smallest value (1-indexed, discrete). Returns
    * (key, q, n, qlo4, qhi4) with SIGNED fixed-point 1e-4 bounds — the
    * exact rank-q value is guaranteed inside [qlo4, qhi4], a ≤10%-wide
    * relative interval. Buckets order by true numeric value:
    * (sgn asc, sgn·lo4 asc).
    */
  def histQuantiles(sketch: DataFrame, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = sketch.groupBy("key").agg(sum("cnt").as("n"))
    val wcum = Window.partitionBy(col("key"))
      .orderBy(col("sgn"), (col("sgn") * col("lo4")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch.withColumn("cum", sum("cnt").over(wcum))
      .join(totals, "key")
      .crossJoin(
        sketch.sparkSession.range(1).select(
          explode(array(qs.map(lit(_)): _*)).as("q")))
      .withColumn("r", ceil(col("q") * col("n")).cast("long"))
      .where(col("cum") >= col("r"))
    val wpick = Window.partitionBy(col("key"), col("q"))
      .orderBy(col("sgn"), (col("sgn") * col("lo4")).asc)
    cum.withColumn("__rk", row_number().over(wpick))
      .where(col("__rk") === 1)
      .select(col("key"), col("q"), col("n"),
        when(col("sgn") < 0, -col("hi4")).otherwise(col("sgn") * col("lo4"))
          .as("qlo4"),
        when(col("sgn") < 0, -col("lo4")).otherwise(col("sgn") * col("hi4"))
          .as("qhi4"))
  }

  /** Candidate generator for heavy hitters: per-partition Misra-Gries with
    * k counters. Guarantee: an item whose count within a partition is
    * > N_p/(k+1) ends the pass with a live counter, so with k = ⌈1/φ⌉
    * every item at partition support ≥ φ survives — and since frequency is
    * additive, any GLOBAL φ-heavy hitter is a φ-local one in at least one
    * partition: the union over partitions is a complete candidate set, at
    * most k items per partition, no shuffle of the item universe anywhere.
    *
    * This is the sanctioned `mapPartitions` case — MG's decrement step is
    * genuinely imperative per-partition state with a hard k-entry memory
    * bound. The emitted candidate set depends on partition layout (a
    * SUPERSET, like the LSH candidate stage); callers must re-count
    * exactly, which [[heavyHitters]] does.
    */
  def mgCandidates(items: DataFrame, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col("item").cast("string")).as[String]
      .mapPartitions { it =>
        val counters = new scala.collection.mutable.HashMap[String, Long]()
        it.foreach { x =>
          if (counters.contains(x)) counters(x) += 1L
          else if (counters.size < k) counters(x) = 1L
          else {
            // decrement all; drop zeros (the classic MG step)
            val dead = new scala.collection.mutable.ArrayBuffer[String]()
            counters.mapValuesInPlace((_, v) => v - 1L)
            counters.foreach { case (key, v) => if (v <= 0L) dead += key }
            dead.foreach(counters.remove)
          }
        }
        counters.keysIterator
      }.toDF("item").distinct()
  }

  /** Heavy hitters of `df`'s item column at support φ: all items whose
    * TRUE frequency is ≥ ⌈φ·N⌉. Misra-Gries candidates (map-side, ≤ ⌈1/φ⌉
    * entries per partition) prune the universe; ONE exact count over the
    * candidate rows only (broadcast semi-join keeps the scan map-side)
    * removes false positives. Output (item, n_item, n_total) is EXACT —
    * the sketch machinery bounds WORK and MEMORY, not accuracy, which is
    * what makes the operator oracle-checkable end to end.
    */
  def heavyHitters(df: DataFrame, itemCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"support phi in (0,1): $phi")
    val items = df.select(col(itemCol).as("item"))
      .where(col("item").isNotNull)
    val total = items.count()
    val thresh = math.ceil(phi * total).toLong.max(1L)
    val cands = mgCandidates(items, math.ceil(1.0 / phi).toInt)
    items.join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("n_item"))
      .where(col("n_item") >= thresh)
      .withColumn("n_total", lit(total))
  }

  // ======================= KMV (bottom-k) sketch ==========================
  //
  // The set-OPERATION member of the sketch family: HLL registers answer
  // union cardinality only; the k-minimum-values sketch (Bar-Yossef et al.
  // 2002; Beyer et al. 2007 "On Synopses for Distinct-Value Estimation")
  // additionally estimates INTERSECTION cardinality across corpora —
  // "how many shingles do yesterday's and today's snapshots share" —
  // from two k-row synopses, never re-touching raw history. Hash family
  // is the repo-wide charFold mod 1e9+7, so the DuckDB oracle replays the
  // identical sketch (bottom-k of a deterministic hash is order-free) and
  // the gates hash-compare exact integer estimates, not bound bits.
  //
  // Relational shape and the 100 TB story: building is hash + distinct +
  // global bottom-k. The distinct shuffles once keyed on the hash; the
  // bottom-k is Spark's TakeOrderedAndProject — per-partition k-row heaps,
  // then a k-row merge, so the driver never sees more than k values and
  // the shuffle after partial aggregation carries at most k rows per
  // partition. Merge is bottom-k of the unioned synopses (k rows each) —
  // a driver-free LIMIT over 2k rows.

  /** Bottom-k synopsis of `df`'s item column: the k smallest DISTINCT
    * hash values, as (f) rows. Hash collisions collapse (the sketch lives
    * in hash space — part of the estimator's error model and reproducible
    * in any engine).
    *
    * The hash is charFold passed through the slot-0 affine mix
    * ((a₀·fold + b₀) mod P): an ORDER-STATISTICS estimator needs values
    * uniform in [0, P), and the raw polynomial fold clusters structured
    * vocabularies (shared prefixes/suffixes and length strata perturb the
    * fold by far less than P, so items stratify into narrow bands —
    * measured 9× skew on a 5k synthetic vocabulary). The affine mix
    * amplifies within-band variation past P, scattering bands across the
    * full range — and it is the same pairwise-independent family the
    * MinHash/Count-Min slots replay in the DuckDB oracle.
    */
  def kmv(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    val fold = TextFunctions.charFold(col(itemCol))
    val mixed = (lit(TextFunctions.coeffA(0)) * fold
      + TextFunctions.coeffB(0)) % TextFunctions.HashMod
    df.select(mixed.as("f"))
      .where(col("f").isNotNull)
      .distinct()
      .orderBy("f").limit(k)
  }

  /** Merge synopses built with the same k: bottom-k of the union — valid
    * because bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)).
    */
  def kmvMerge(k: Int, sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _).distinct().orderBy("f").limit(k)

  /** Distinct-cardinality estimate from a synopsis: if the sketch holds
    * fewer than k values the count is EXACT (the whole hash set fit);
    * otherwise est = (k−1)·P / f_(k) with the k-th smallest value f_(k) —
    * the classic unbiased KMV estimator, in pure BIGINT arithmetic.
    * Returns one row (n_kept, f_kth, est).
    */
  def kmvCardinality(sketch: DataFrame, k: Int): DataFrame = {
    // BIGINT `div`, not `/`: double division of longs near an integer
    // boundary can round UP across it (1/f_kth ≪ ulp of the quotient),
    // and the oracle compares these estimates bit-for-bit
    val num = (k - 1).toLong * TextFunctions.HashMod
    sketch.agg(count(lit(1)).as("n_kept"), max(col("f")).as("f_kth"))
      .select(col("n_kept"), col("f_kth"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"CAST($num AS BIGINT) div f_kth"))
          .as("est"))
  }

  /** Intersection-cardinality estimate from two synopses: over the k
    * smallest values of the UNION, the fraction present in BOTH synopses
    * estimates Jaccard, scaled by the union's cardinality estimate
    * (Beyer et al. 2007 §4). Integer end-to-end:
    * est_inter = ⌊matched · est_union / k_u⌋ where k_u = |union synopsis|.
    * Returns one row (k_union, matched, est_union, est_intersection).
    */
  def kmvIntersect(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = kmvMerge(k, a, b).localCheckpoint(true)
    val inBoth = u
      .join(a.select(col("f").as("fa")), col("f") === col("fa"), "left_semi")
      .join(b.select(col("f").as("fb")), col("f") === col("fb"), "left_semi")
    val uCard = kmvCardinality(u, k)
      .select(col("n_kept").as("k_union"), col("est").as("est_union"))
    inBoth.agg(count(lit(1)).as("matched")).crossJoin(uCard)
      .select(col("k_union"), col("matched"), col("est_union"),
        expr("(matched * est_union) div k_union").as("est_intersection"))
  }
}
