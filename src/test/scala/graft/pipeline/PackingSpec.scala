package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {

  // token counts by whitespace tokenization: 3, 4, 2, 5, 3
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (10L, "alpha beta gamma"),
      (11L, "one two three four"),
      (12L, "tiny doc"),
      (13L, "five six seven eight nine"),
      (14L, "tail end words"),
      (15L, "") // zero tokens: must vanish from both packings
    ).toDF("doc_id", "text")
  }

  test("packChunks splits the concatenated stream into exact fixed windows") {
    // stream in id order: 3+4+2+5+3 = 17 tokens; seqLen=4 -> 5 chunks
    val out = Packing.packChunks(docs, "doc_id", "text", seqLen = 4)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (10L, 0L, 0L, 3L),            // [0,3) in chunk 0
      (11L, 0L, 0L, 1L),            // token 3 completes chunk 0
      (11L, 1L, 1L, 3L),            // tokens 4-6 open chunk 1
      (12L, 1L, 0L, 1L),            // token 7 ends chunk 1
      (12L, 2L, 1L, 1L),            // token 8 opens chunk 2
      (13L, 2L, 0L, 3L),            // tokens 9-11
      (13L, 3L, 3L, 2L),            // tokens 12-13
      (14L, 3L, 0L, 2L),            // tokens 14-15 end chunk 3
      (14L, 4L, 2L, 1L)),           // token 16 opens chunk 4
      s"got ${out.toSeq}")
  }

  test("packChunks is invariant to the bucket count and loses no tokens") {
    val big = spark.range(0, 400)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 to 6).map(i =>
          concat(lit("w"), pmod(col("id") + i, lit(11)))): _*).as("text"))
    val a = Packing.packChunks(big, "doc_id", "text", 64, buckets = 3)
    val b = Packing.packChunks(big, "doc_id", "text", 64, buckets = 17)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "chunk map must not depend on parallelism")
    // conservation: slices of each doc tile [0, n_tok) exactly
    val tot = a.agg(sum("n_slice")).head().getLong(0)
    assert(tot == 400L * 7, s"token conservation: $tot")
    // every chunk except the last is exactly full
    val sizes = a.groupBy("chunk_id").agg(sum("n_slice").as("sz"))
      .orderBy("chunk_id").collect().map(_.getLong(1))
    assert(sizes.dropRight(1).forall(_ == 64L) && sizes.last <= 64L)
  }

  test("packGreedy never splits docs, never overflows, resets per bucket") {
    val out = Packing.packGreedy(docs, "doc_id", "text",
      seqLen = 6, buckets = 2).collect()
    // no zero-token docs, no doc above the cap
    assert(out.length == 5)
    assert(out.forall(_.getAs[Long]("n_tok") <= 6L))
    // within each (bucket, seq): offsets tile without overflow
    val bySeq = out.groupBy(r =>
      (r.getAs[Long]("bucket"), r.getAs[Long]("seq_idx")))
    bySeq.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("off_in_seq"))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("off_in_seq") == expect, s"gap in seq $k")
        expect += r.getAs[Long]("n_tok")
      }
      assert(expect <= 6L, s"overflow in seq $k")
    }
    // greedy within bucket 0 (docs 10:3tok, 12:2tok, 14:3tok): 3+2 fit,
    // 14 overflows into seq 1
    val b0 = out.filter(_.getAs[Long]("bucket") == 0L)
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("seq_idx"), r.getAs[Long]("off_in_seq"))).toMap
    assert(b0 == Map(10L -> (0L, 0L), 12L -> (0L, 3L), 14L -> (1L, 0L)),
      s"bucket 0: $b0")
  }

  test("packGreedy truncates oversize docs to one full sequence") {
    import spark.implicits._
    val wide = Seq((1L, (1 to 50).map(i => s"t$i").mkString(" ")),
      (3L, "a b c")).toDF("doc_id", "text")
    val out = Packing.packGreedy(wide, "doc_id", "text",
      seqLen = 8, buckets = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("seq_idx"), r.getAs[Long]("off_in_seq"),
          r.getAs[Long]("n_tok"))).toMap
    assert(out(1L) == (0L, 0L, 8L), s"truncated head: $out")
    assert(out(3L) == (1L, 0L, 3L), s"next doc opens a fresh seq: $out")
  }
}
