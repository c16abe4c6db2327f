package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Unigram-LM tokenizer family (Kudo 2018; the SentencePiece trainer) at
  * word-level symbols — the third tokenizer family next to
  * [[TextAnalysis.bpeMerges]]'s BPE and [[WordPiece.wordpieceMerges]],
  * differing in its whole induction shape:
  *
  *  - BPE and WordPiece GROW a vocabulary one merge at a time (each round
  *    is a global argmax, so the trainer is inherently sequential — the
  *    driver heap loop / per-round distributed recount).
  *  - Unigram SHRINKS a seeded vocabulary by expectation-maximization:
  *    seed every word n-gram above a count floor, then per round
  *    (E) Viterbi-segment the corpus under the current phrase
  *    probabilities and (M) re-estimate each phrase's probability from
  *    its segmentation usage, dropping phrases that go unused.
  *
  * That makes Unigram the BEST-shaped trainer for a distributed engine:
  * a round is one broadcast (the vocab probabilities, vocabulary-bounded)
  * plus one map-side corpus pass (the Viterbi E-step) plus one
  * vocabulary-bounded groupBy (the M-step recount) — embarrassingly
  * parallel, no driver loop, no per-merge sequential dependency. R rounds
  * cost R linear corpus passes regardless of vocabulary size, where a 32k
  * BPE vocabulary costs 32k sequential argmax rounds.
  *
  * == Cross-engine exactness ==
  *
  * The Viterbi DP is bit-reproducible in ANY IEEE-754 engine (the DuckDB
  * oracle replays it exactly) because it uses no floating-point ADDITION
  * anywhere — only operations with a single correctly-rounded result:
  *
  *  - phrase probabilities `cnt/total`: one Long→Double cast (exact below
  *    2^53) and one correctly-rounded division;
  *  - path scores: products of probabilities (each multiply correctly
  *    rounded, evaluated in the same left-to-right order);
  *  - comparisons/max: order-independent for non-NaN doubles;
  *  - underflow renormalization: multiplication by 2^400 — a power of
  *    two, hence EXACT (no rounding) — triggered by a deterministic
  *    `best < 2^-400` test. A 99-token path of 2^-17 probabilities walks
  *    past 1e-500; raw products would hit subnormal flush and die.
  *
  * Ties choose the LONGEST phrase (the CASE order `c3, c2, c1` in the
  * oracle; the `>=`-sweep from L=1 upward here — identical selection).
  */
object Unigram {

  /** Renormalization floor/scale: exact powers of two, so rescaling never
    * rounds and the argmax is scale-invariant.
    */
  private[pipeline] val RenormLo: Double = math.pow(2.0, -400)
  private[pipeline] val RenormUp: Double = math.pow(2.0, 400)

  /** Seed vocabulary: every word n-gram of length 1..`maxPhraseLen` with
    * corpus count ≥ `minCount` — except length-1 grams, which are ALWAYS
    * kept (the base alphabet; without them a document containing a rare
    * word has no segmentation, the same reason SentencePiece always keeps
    * single characters). Returns (phrase, plen, cnt); `phrase` is the
    * space-joined word sequence. One shuffle, vocabulary-bounded output.
    *
    * `maxVocab` caps the MULTI-word seed at the top-V by (cnt desc,
    * phrase asc) — SentencePiece's seed prune, and the bound that keeps
    * the per-round probability broadcast vocabulary-sized no matter how
    * large the corpus: without it, a 100 TB corpus with a heavy n-gram
    * tail could push the seed past what one executor's broadcast slot
    * holds even above a sane `minCount`. Deterministic (total order), so
    * the DuckDB oracle can replay it; the default is far above any
    * vocabulary the gates see, leaving them cap-invisible.
    */
  def seedVocab(docs: DataFrame, textCol: String, maxPhraseLen: Int = 3,
                minCount: Long = 3L, maxVocab: Int = 1 << 20): DataFrame =
    seedFromWeighted(
      docs.select(tokens(col(textCol)).as("toks"), lit(1L).as("w")),
      maxPhraseLen, minCount, maxVocab)

  /** Seed census over a pre-folded (toks, w) table — what [[train]] uses
    * so the corpus is tokenized once (the distinct-sequence fold already
    * paid it); a weighted n-gram sum over distinct sequences equals the
    * per-document census exactly.
    */
  private def seedFromWeighted(toksW: DataFrame, maxPhraseLen: Int,
                               minCount: Long, maxVocab: Int): DataFrame = {
    val grams = (1 to maxPhraseLen).map { l =>
      // the where-guard matters: sequence(1, n) DESCENDS for n < 1
      val gram = transform(
        sequence(lit(1), size(col("toks")) - l + 1),
        i => concat_ws(" ", slice(col("toks"), i, lit(l))))
      toksW.where(size(col("toks")) >= l)
        .select(explode(gram).as("phrase"), lit(l).as("plen"), col("w"))
    }.reduce(_ unionAll _)
    val counted = grams.groupBy("phrase", "plen")
      .agg(sum(col("w")).as("cnt"))
    val singles = counted.where(col("plen") === 1)
    val multis = counted.where(col("plen") >= 2 && col("cnt") >= minCount)
    // engage the cap only when exceeded (one extra vocab-bounded count
    // pass); the capped path is a distributed sort+limit, never a
    // single-partition window. Engaging is LOUD (warn log) — the DuckDB
    // oracle mirrors the same (cnt desc, phrase asc) top-V prune, but a
    // silent engagement at a new scale deserves an operator's eye.
    val nMulti = multis.count()
    val capped =
      if (nMulti <= maxVocab) multis
      else {
        org.slf4j.LoggerFactory.getLogger(Unigram.getClass).warn(
          s"unigram seed cap engaged: $nMulti multi-grams above the count " +
            s"floor, keeping top $maxVocab by (cnt desc, phrase asc)")
        multis.orderBy(col("cnt").desc, col("phrase")).limit(maxVocab)
      }
    singles.unionByName(capped)
  }

  /** Viterbi backpointers for one token sequence under phrase
    * probabilities `p` (space-joined keys; misses score zero). Entry j
    * (0-based) holds the length of the best phrase ENDING at position
    * j+1. During TRAINING length-1 lookups never miss ([[seedVocab]]/
    * [[train]] keep every single), but [[encode]] is a production face
    * over NEW documents through a persisted [[graft.store.TokenizerStore]]
    * vocabulary, where an out-of-vocabulary token is reachable: the OOV
    * position scores 0 everywhere, is emitted as its own single-token
    * piece, and the carried score RESTARTS at 1.0 so segmentation resumes
    * optimally after it (SentencePiece's unknown handling; without the
    * restart every position after the first OOV would degrade to the
    * chosen=1 fallback). Phrases SPANNING the OOV token are correctly
    * dead — they contain it, so they cannot be in the vocabulary.
    * Training behavior is untouched (best > 0 always holds there). Kept
    * in exact lockstep with the oracle's recursive walk — see the object
    * scaladoc for why every step is bit-reproducible.
    */
  private[pipeline] def viterbiPath(toks: Array[String],
      p: java.util.HashMap[String, java.lang.Double],
      maxPhraseLen: Int): Array[Int] = {
    val n = toks.length
    val path = new Array[Int](n)
    // b(0) = best ending at the current position j, b(1) at j-1, ...
    val b = new Array[Double](maxPhraseLen)
    b(0) = 1.0
    val sb = new java.lang.StringBuilder(64)
    var j = 1
    while (j <= n) {
      var best = 0.0
      var chosen = 1
      var l = 1
      val lmax = math.min(maxPhraseLen, j)
      while (l <= lmax) {
        val base = if (l == 1) b(0) else b(l - 1)
        if (base > 0.0) {
          sb.setLength(0)
          var k = j - l
          while (k < j) {
            if (k > j - l) sb.append(' ')
            sb.append(toks(k)); k += 1
          }
          val prob = p.get(sb.toString)
          if (prob != null) {
            val cand = base * prob.doubleValue
            // >= sweeping upward == the oracle's "largest L wins ties"
            if (cand >= best) { best = cand; chosen = l }
          }
        }
        l += 1
      }
      // OOV restart: no phrase ending here is in the vocabulary (possible
      // only on encode over new documents) — emit the token as its own
      // piece and reset the DP score so segmentation resumes after it
      if (best == 0.0) { best = 1.0; chosen = 1 }
      // shift the carried window, then renormalize EXACTLY (2^400) when
      // the new best crosses the floor — same trigger, same scaling, same
      // order as the oracle
      var m = maxPhraseLen - 1
      while (m > 0) { b(m) = b(m - 1); m -= 1 }
      b(0) = best
      if (best < RenormLo) {
        var x = 0
        while (x < maxPhraseLen) { b(x) *= RenormUp; x += 1 }
      }
      path(j - 1) = chosen
      j += 1
    }
    path
  }

  /** Segment `toks` by [[viterbiPath]] and emit the used phrases
    * (space-joined, with their length), walking the backpointers from the
    * end.
    */
  private[pipeline] def segment(toks: Array[String],
      p: java.util.HashMap[String, java.lang.Double],
      maxPhraseLen: Int): Seq[(String, Int)] = {
    val path = viterbiPath(toks, p, maxPhraseLen)
    val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    var pos = toks.length
    while (pos > 0) {
      val l = path(pos - 1)
      out += ((toks.slice(pos - l, pos).mkString(" "), l))
      pos -= l
    }
    out.toSeq
  }

  /** Collect a (phrase, plen, cnt) vocab table into broadcastable
    * probability form. `total` is the Long sum of all kept counts; each
    * p = cnt.toDouble / total.toDouble (both casts exact below 2^53, the
    * division correctly rounded — the oracle's `cnt::DOUBLE /
    * sum::DOUBLE`).
    */
  private def probMap(vocab: DataFrame)
      : java.util.HashMap[String, java.lang.Double] = {
    val rows = vocab.select(col("phrase"), col("cnt").cast("long"))
      .collect()
    var total = 0L
    rows.foreach(r => total += r.getLong(1))
    val td = total.toDouble
    val m = new java.util.HashMap[String, java.lang.Double](rows.length * 2)
    rows.foreach(r => m.put(r.getString(0), r.getLong(1).toDouble / td))
    m
  }

  /** One hard-EM round: Viterbi-segment the weighted distinct sequences
    * under `vocab` probabilities, recount usage, and return the next
    * vocab — every seed single survives with count max(usage, 1) (the
    * base alphabet never leaves, unused singles keep a floor probability
    * so coverage is total), multi-word phrases survive only if USED.
    */
  private def emRound(
      weighted: Dataset[(Seq[String], Long)],
      singles: DataFrame, vocab: DataFrame, maxPhraseLen: Int): DataFrame = {
    val spark = weighted.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(probMap(vocab))
    val usage = weighted.mapPartitions { it =>
      val p = bc.value
      it.flatMap { case (ts, w) =>
        segment(ts.toArray, p, maxPhraseLen).map {
          case (ph, l) => (ph, l, w)
        }
      }
    }.toDF("phrase", "plen", "w")
      .groupBy("phrase", "plen").agg(sum("w").as("n"))
    // join singles usage at plen=1 explicitly (the oracle's USING (phrase,
    // plen)) — correctness must not lean on the implicit invariant that
    // single tokens never collide with a space-joined multi-gram string
    singles.join(usage.where(col("plen") === 1).select("phrase", "n"),
        Seq("phrase"), "left")
      .select(col("phrase"), lit(1).as("plen"),
        greatest(coalesce(col("n"), lit(0L)), lit(1L)).as("cnt"))
      .unionAll(usage.where(col("plen") >= 2)
        .select(col("phrase"), col("plen"), col("n").as("cnt")))
  }

  /** Train a Unigram-LM phrase vocabulary by `rounds` hard-EM rounds over
    * the seed (see object scaladoc). Returns the final (phrase, plen,
    * cnt) — singles floored at 1, multi-word phrases with their last
    * Viterbi usage count.
    *
    * Scale: the corpus folds once into a distinct `(sequence, weight)`
    * table (the [[WordPiece.wordpieceMerges]] discipline); each round is
    * a broadcast + map pass + vocabulary-bounded shuffle. The vocab
    * collect is bounded by `minCount` exactly as the BM25 vocabulary
    * broadcasts in [[Search]].
    *
    * The returned vocab is persisted (it was forced during the last
    * round) and REGISTERED with [[graft.operators.TransientCache]]: a
    * long-lived session that retrains after a corpus-store compaction
    * must not keep a CacheManager fragment whose plan reads the old
    * corpus files — draining drivers reclaim it. Callers may also
    * `unpersist()` it themselves once consumed.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int = 2,
            maxPhraseLen: Int = 3, minCount: Long = 3L,
            maxVocab: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val weighted = docs
      .select(tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= 1)
      .groupBy("toks").agg(count(lit(1)).as("w"))
      .as[(Seq[String], Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seed from the folded table: the corpus is tokenized ONCE (here),
      // and a weighted census over distinct sequences equals the raw one
      val seed = seedFromWeighted(weighted.toDF("toks", "w"),
          maxPhraseLen, minCount, maxVocab)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val singles = seed.where(col("plen") === 1).select("phrase")
        var vocab = seed
        var r = 0
        while (r < rounds) {
          val next = emRound(weighted, singles, vocab, maxPhraseLen)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          if (r > 0) vocab.unpersist()
          vocab = next
          r += 1
        }
        if (rounds > 0) graft.operators.TransientCache.register(vocab)
        vocab
      } finally { seed.unpersist(); () }
    } finally { weighted.unpersist(); () }
  }

  /** Segment every document under a trained (phrase, plen, cnt) vocab and
    * return (doc_id, n_tokens_raw, n_tokens_uni) — the [[WordPiece
    * .wordpieceEncode]] output shape. Broadcast vocab, map-side DP,
    * nothing shuffled. `maxPhraseLen` ≤ 0 (the default) derives it from
    * the vocab's longest phrase.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, maxPhraseLen: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val lmax =
      if (maxPhraseLen > 0) maxPhraseLen
      else vocab.agg(max(col("plen").cast("int"))).head().getInt(0)
    val bc = spark.sparkContext.broadcast(probMap(vocab))
    val bcMax = spark.sparkContext.broadcast(lmax)
    val nPieces = udf { toks: Seq[String] =>
      val arr = toks.toArray
      val path = viterbiPath(arr, bc.value, bcMax.value)
      var pos = arr.length; var n = 0L
      while (pos > 0) { pos -= path(pos - 1); n += 1 }
      n
    }
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens_raw"),
        nPieces(col("toks")).as("n_tokens_uni"))
  }
}
