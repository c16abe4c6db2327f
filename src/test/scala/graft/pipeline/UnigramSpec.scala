package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi exactness (vs brute force and vs an
  * exact-rational DP across the renormalization boundary), hard-EM
  * training behavior, and the persisted-artifact round trip.
  */
class UnigramSpec extends SparkSpec {

  private def probs(m: Map[String, Double]) = {
    val h = new java.util.HashMap[String, java.lang.Double]()
    m.foreach { case (k, v) => h.put(k, v) }
    h
  }

  private def pathProduct(toks: Array[String], path: Array[Int],
                          p: Map[String, Double]): Double = {
    // replay the product in backtrack order — multiplication order doesn't
    // matter for the comparison tests below (all-dyadic => exact)
    var pos = toks.length; var prod = 1.0
    while (pos > 0) {
      val l = path(pos - 1)
      prod *= p(toks.slice(pos - l, pos).mkString(" "))
      pos -= l
    }
    prod
  }

  /** All segmentations of n positions into pieces of length 1..lmax. */
  private def tilings(n: Int, lmax: Int): Seq[List[Int]] =
    if (n == 0) Seq(Nil)
    else (1 to math.min(lmax, n)).flatMap(l => tilings(n - l, lmax).map(l :: _))

  test("viterbiPath matches brute-force enumeration on random small cases") {
    val rnd = new scala.util.Random(7)
    val words = Array("a", "b", "c")
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(7)
      val toks = Array.fill(n)(words(rnd.nextInt(words.length)))
      // dyadic probabilities => every product is exact, so the double DP
      // must agree with enumeration EXACTLY
      val vocabKeys = (for {
        len <- 1 to 3
        i <- 0 to n - len
      } yield toks.slice(i, i + len).mkString(" ")).distinct ++ words
      val p = vocabKeys.distinct.map { k =>
        k -> math.pow(2.0, -(1 + rnd.nextInt(6)))
      }.toMap
      val path = Unigram.viterbiPath(toks, probs(p), 3)
      val got = pathProduct(toks, path, p)
      val best = tilings(n, 3).flatMap { tile =>
        // walk the tiling left to right; skip tilings using missing phrases
        val (prod, ok, _) = tile.foldLeft((1.0, true, 0)) {
          case ((pr, ok, off), l) =>
            val key = toks.slice(off, off + l).mkString(" ")
            p.get(key) match {
              case Some(x) => (pr * x, ok, off + l)
              case None => (pr, false, off + l)
            }
        }
        if (ok) Some(prod) else None
      }.max
      assert(got == best, s"toks=${toks.mkString(",")} got=$got best=$best")
    }
  }

  test("renormalization is exact: long underflowing path equals a " +
       "BigInt-rational DP") {
    // counts are powers of two summing to a power of two, so every
    // probability, product, and 2^400 rescale is EXACT in doubles — the
    // double DP must agree with exact integer arithmetic even though the
    // raw product (~2^-7 per step over 120 steps ~ 2^-840) underflows
    // without renormalization
    val counts = Map("x" -> 4L, "y" -> 4L, "x y" -> 8L, "y x" -> 16L)
    val total = counts.values.sum // 32, a power of two
    val p = counts.map { case (k, v) => k -> v.toDouble / total.toDouble }
    val toks = Array.tabulate(120)(i => if (i % 2 == 0) "x" else "y")
    val path = Unigram.viterbiPath(toks, probs(p), 3)
    // exact ground truth: DP over BigInt numerators with piece-count
    // normalization — compare a1/t^k1 vs a2/t^k2 by cross-multiplication
    case class Cell(num: BigInt, k: Int)
    val t = BigInt(total)
    def better(a: Cell, b: Cell): Boolean = // a strictly better than b
      a.num * t.pow(b.k) > b.num * t.pow(a.k)
    val cells = new Array[Cell](toks.length + 1)
    val back = new Array[Int](toks.length + 1)
    cells(0) = Cell(BigInt(1), 0)
    for (j <- 1 to toks.length) {
      var bestC: Cell = null
      for (l <- 1 to math.min(3, j)) {
        val key = toks.slice(j - l, j).mkString(" ")
        if (cells(j - l) != null && counts.contains(key)) {
          val cand = Cell(cells(j - l).num * counts(key), cells(j - l).k + 1)
          // ties prefer the longer phrase, like the double DP's >= sweep
          if (bestC == null || better(cand, bestC) ||
              (!better(bestC, cand) && !better(cand, bestC)))
            { bestC = cand; back(j) = l }
        }
      }
      cells(j) = bestC
    }
    // compare piece sequences
    def pieces(bp: Int => Int): List[Int] = {
      var pos = toks.length; var out = List.empty[Int]
      while (pos > 0) { out = bp(pos) :: out; pos -= bp(pos) }
      out
    }
    assert(pieces(j => path(j - 1)) == pieces(j => back(j)))
  }

  test("seedVocab counts n-grams with a floor, singles always kept") {
    import spark.implicits._
    val docs = Seq("a b a b a", "a b c", "z").toDF("text")
    val seed = Unigram.seedVocab(docs, "text", maxPhraseLen = 3,
      minCount = 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(seed(("a", 1)) == 4L && seed(("z", 1)) == 1L) // single below floor kept
    assert(seed(("a b", 2)) == 3L)
    assert(seed(("a b a", 3)) == 2L)
    assert(!seed.contains(("b c", 2))) // count 1 < floor
  }

  test("seedVocab maxVocab caps multis deterministically, singles exempt") {
    import spark.implicits._
    val docs = Seq("a b a b a b", "b c b c b c", "c a c a").toDF("text")
    val seed = Unigram.seedVocab(docs, "text", maxPhraseLen = 2,
      minCount = 1, maxVocab = 2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(seed.keys.count(_._2 == 1) == 3) // all singles kept
    val multis = seed.keys.filter(_._2 == 2).toSet
    assert(multis.size == 2)
    // top-2 by (cnt desc, phrase asc): "a b"(3), "b c"(3) beat
    // "b a"(2), "c b"(2), "c a"(2), "a c"(1)
    assert(multis == Set(("a b", 2), ("b c", 2)))
  }

  test("train: unused multis pruned, unused singles floored at 1; " +
       "encode counts the Viterbi pieces") {
    import spark.implicits._
    val docs = Seq.fill(5)("q r q r").toDF("text")
    val vocab = Unigram.train(docs, "text", rounds = 2, maxPhraseLen = 3,
      minCount = 2)
    val rows = vocab.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // "q r" dominates every segmentation: the singles go unused → floor 1
    assert(rows(("q", 1)) == 1L && rows(("r", 1)) == 1L)
    assert(rows(("q r", 2)) == 10L) // 5 docs × 2 uses
    // multis that lose every Viterbi (e.g. "r q") are pruned
    assert(!rows.contains(("r q", 2)))
    val enc = Unigram.encode(docs.withColumn("doc_id", lit(1)),
      "doc_id", "text", vocab).head()
    assert(enc.getLong(1) == 4L && enc.getLong(2) == 2L)
  }

  test("encode over NEW documents: an OOV token becomes its own piece and " +
       "the DP restarts — in-vocab phrases after it still win") {
    import spark.implicits._
    val train = Seq.fill(5)("q r q r").toDF("text")
    val vocab = Unigram.train(train, "text", rounds = 2, maxPhraseLen = 3,
      minCount = 2)
    // production face: a persisted store encodes documents the trainer
    // never saw — "zzz" is out of vocabulary
    val dir = java.nio.file.Files.createTempDirectory("graft-unioov").toString
    graft.store.TokenizerStore.saveUnigram(spark, dir, vocab)
    val store = graft.store.TokenizerStore.open(spark, dir)
    val newDocs = Seq(
      (1L, "q r zzz q r"),   // OOV mid-doc: [q r][zzz][q r] = 3 pieces
      (2L, "zzz q r q r"),   // OOV first:  [zzz][q r][q r] = 3 pieces
      (3L, "zzz zzz zzz"),   // all OOV: 3 single pieces
      (4L, "q r q r")        // control, no OOV: [q r][q r] = 2 pieces
    ).toDF("doc_id", "text")
    val got = store.encode(newDocs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 5L, 3L), (2L, 5L, 3L), (3L, 3L, 3L), (4L, 4L, 2L)),
      s"got $got")
  }

  test("TokenizerStore round-trips the unigram vocabulary") {
    import spark.implicits._
    val docs = Seq("m n m n", "m n o").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = Unigram.train(docs, "text", rounds = 1, maxPhraseLen = 3,
      minCount = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-unistore")
      .toString
    graft.store.TokenizerStore.saveUnigram(spark, dir, vocab)
    val store = graft.store.TokenizerStore.open(spark, dir)
    assert(store.kind == graft.store.TokenizerStore.KindUnigram)
    val direct = Unigram.encode(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect().toSeq
    val stored = store.encode(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(direct == stored)
  }
}
