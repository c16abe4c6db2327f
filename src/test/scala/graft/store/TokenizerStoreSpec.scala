package graft.store

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.{TextAnalysis, WordPiece}

class TokenizerStoreSpec extends SparkSpec {

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"tokstore_$tag")
    d.toFile.deleteOnExit()
    d.toString + "/store"
  }

  test("wordpiece round-trip: stored encode == in-memory encode; meta preserved") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = WordPiece.wordpieceMerges(docs, "text", rounds = 4, minPairs = 3)
    val dir = tmpDir("wp")
    TokenizerStore.save(spark, dir, merges,
      TokenizerStore.KindWordPiece, minPairs = 3)
    val st = TokenizerStore.open(spark, dir)
    assert(st.kind === TokenizerStore.KindWordPiece)
    assert(st.minPairs === 3L)
    assert(st.merges.collect().map(_.toSeq).toSeq ===
      merges.orderBy("round").collect().map(_.toSeq).toSeq)
    val mem = WordPiece.wordpieceEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stored = st.encode(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(stored === mem)
  }

  test("bpe round-trip: stored encode == in-memory encode; score12 column absent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextAnalysis.bpeMerges(docs, "text", rounds = 4)
    val dir = tmpDir("bpe")
    TokenizerStore.save(spark, dir, merges, TokenizerStore.KindBpe)
    val st = TokenizerStore.open(spark, dir)
    assert(st.kind === TokenizerStore.KindBpe)
    assert(st.merges.columns.toSeq === Seq("round", "pair", "n_pairs"))
    val mem = TextAnalysis.bpeEncodeWith(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stored = st.encode(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(stored === mem)
  }

  test("publish is an atomic overwrite: a retrain replaces the artifact") {
    import spark.implicits._
    val docsA = Seq((1L, "x y x y x y"), (2L, "x y")).toDF("doc_id", "text")
    val docsB = Seq((1L, "p q p q p q"), (2L, "p q")).toDF("doc_id", "text")
    val dir = tmpDir("swap")
    TokenizerStore.save(spark, dir,
      WordPiece.wordpieceMerges(docsA, "text", rounds = 1, minPairs = 2),
      TokenizerStore.KindWordPiece, minPairs = 2)
    assert(TokenizerStore.open(spark, dir).merges
      .select("pair").as[String].head() === "x y")
    TokenizerStore.save(spark, dir,
      WordPiece.wordpieceMerges(docsB, "text", rounds = 1, minPairs = 2),
      TokenizerStore.KindWordPiece, minPairs = 2)
    assert(TokenizerStore.open(spark, dir).merges
      .select("pair").as[String].head() === "p q")
  }

  test("unknown kind is refused at save") {
    import spark.implicits._
    val m = Seq((1, "a b", 2L)).toDF("round", "pair", "n_pairs")
    intercept[IllegalArgumentException] {
      TokenizerStore.save(spark, tmpDir("bad"), m, "unigram")
    }
  }
}
