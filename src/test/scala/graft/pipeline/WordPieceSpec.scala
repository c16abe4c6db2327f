package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WordPieceSpec extends SparkSpec {

  /** Brute-force reference: per round, fully recount symbols and pairs,
    * score every pair ⌊n·10¹²/(n_a·n_b)⌋, argmax (score desc, pair asc)
    * above the floor, merge exhaustively left-to-right. The incremental
    * driver trainer must equal this on any corpus.
    */
  private def bruteTrain(docs: Seq[(Seq[String], Long)], rounds: Int,
                         minPairs: Long): Seq[(Int, String, Long, Long)] = {
    val scale = BigInt("1000000000000")
    var cur = docs.flatMap { case (s, w) =>
      Seq.fill(w.toInt)(s.toArray)
    }.toArray
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]()
    var k = 1
    var done = false
    while (k <= rounds && !done) {
      val syms = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      cur.foreach { arr =>
        arr.foreach(s => syms(s) += 1)
        arr.sliding(2).filter(_.length == 2)
          .foreach(p => pairs((p(0), p(1))) += 1)
      }
      val cands = pairs.toSeq.filter(_._2 >= minPairs).map { case ((a, b), n) =>
        val s = ((BigInt(n) * scale) / (BigInt(syms(a)) * BigInt(syms(b)))).toLong
        (a, b, n, s)
      }
      if (cands.isEmpty) done = true
      else {
        val (a, b, n, s) = cands.minBy { case (x, y, _, sc) => (-sc, x + " " + y) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String))
        out += ((k, a + " " + b, n, s))
        cur = cur.map(arr => TextAnalysis.applyOneMerge(arr, a, b))
        k += 1
      }
    }
    out.toSeq
  }

  test("driver trainer equals the brute-force recount on a hand corpus") {
    val corpus = Seq(
      (Seq("new", "york", "is", "big"), 3L),
      (Seq("new", "york", "new", "york"), 2L),
      (Seq("the", "the", "the", "is", "big"), 4L),
      (Seq("solo"), 5L), // single-symbol doc: feeds denominators only
      (Seq("is", "big", "new", "york", "is"), 1L))
    for (minPairs <- Seq(1L, 3L); rounds <- Seq(1, 3, 6)) {
      val got = WordPiece.trainWordPieceDriver(
        corpus.map { case (s, w) => (s.toArray, w) }.toArray, rounds, minPairs)
      val want = bruteTrain(corpus, rounds, minPairs)
      assert(got === want, s"minPairs=$minPairs rounds=$rounds")
    }
  }

  test("property: driver trainer equals brute recount on random corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 25) {
      val corpus = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))),
          1L + rnd.nextInt(3))
      }
      val minPairs = 1L + rnd.nextInt(3)
      val got = WordPiece.trainWordPieceDriver(
        corpus.map { case (s, w) => (s.toArray, w) }.toArray, 8, minPairs)
      val want = bruteTrain(corpus, 8, minPairs)
      assert(got === want, s"trial=$trial minPairs=$minPairs\n$corpus")
    }
  }

  test("driver face equals the distributed face on real documents") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val drv = WordPiece.wordpieceMerges(docs, "text", rounds = 6,
      minPairs = 3).orderBy("round").collect().map(_.toSeq).toSeq
    val dist = WordPiece.wordpieceMerges(docs, "text", rounds = 6,
      minPairs = 3, driverMaxDistinctSeqs = 0L)
      .orderBy("round").collect().map(_.toSeq).toSeq
    assert(drv === dist)
    assert(drv.nonEmpty)
  }

  test("ratio argmax differs from BPE's count argmax where independence differs") {
    import spark.implicits._
    // "of the" occurs most often but both words are everywhere (low ratio);
    // "new york" is rarer but tightly bound (high ratio)
    val rows = (
      Seq.fill(8)("of the people and of the state") ++
      Seq.fill(3)("new york") ++
      Seq.fill(6)("the of") // break of->the adjacency dominance balance
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val wp = WordPiece.wordpieceMerges(df, "text", rounds = 1, minPairs = 3)
      .select("pair").as[String].head()
    val bpe = TextAnalysis.bpeMerges(df, "text", rounds = 1)
      .select("pair").as[String].head()
    assert(wp === "new york", s"wordpiece picked $wp")
    assert(bpe === "of the", s"bpe picked $bpe")
  }

  test("greedy longest-match encode: longest phrase wins; nested merges flatten") {
    import spark.implicits._
    // merges: (a b) round 1, then (a_b c) round 2 -> phrases [a b], [a b c]
    val merges = Seq((1, "a b", 5L, 100L), (2, "a_b c", 4L, 90L))
      .toDF("round", "pair", "n_pairs", "score12")
    val docs = Seq(
      (1L, "a b c d"),   // a_b_c + d            -> 2
      (2L, "a b d c"),   // a_b + d + c          -> 3
      (3L, "x a b c"),   // x + a_b_c            -> 2
      (4L, "a a b c"),   // a + a_b_c            -> 2 (greedy at pos 2)
      (5L, "c b a"),     // no phrase            -> 3
      (6L, "a"))         // single token         -> 1
      .toDF("doc_id", "text")
    val got = WordPiece.wordpieceEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens_raw", "n_tokens_wp")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 4L, 2L), (2L, 4L, 3L), (3L, 4L, 2L),
      (4L, 4L, 2L), (5L, 3L, 3L), (6L, 1L, 1L)))
  }

  test("minPairs floor: below-floor pairs are never merged") {
    import spark.implicits._
    val df = Seq((1L, "p q p q r s"), (2L, "p q")).toDF("doc_id", "text")
    // p q occurs 3x; every other pair once — with the floor at 2 only
    // p q (and later phrases meeting the floor) can merge
    val merges = WordPiece.wordpieceMerges(df, "text", rounds = 4,
      minPairs = 2).select("pair", "n_pairs").as[(String, Long)].collect()
    assert(merges.forall(_._2 >= 2), merges.mkString(", "))
    assert(merges.head._1 === "p q")
  }
}
