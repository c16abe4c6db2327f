package graft.pipeline

import graft.SparkSpec
import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

/** The synthetic scale-up must grow the corpus without fabricating
  * degenerate duplicate structure — children may not be near-dups of their
  * parents, copies of an embedding may not be cosine-1.0 twins.
  */
class ScaleUpSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("scaleDocuments: 10x rows, copy 0 verbatim, children are not near-dups") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val out = ScaleUp.scaleDocuments(docs, 10).cache()
    assert(out.count() === n * 10)
    assert(out.select("doc_id").distinct().count() === n * 10)

    // copy 0 is the original corpus, byte-identical
    val c0 = out.where(col("doc_id") < n)
    assert(c0.exceptAll(docs.select("doc_id", "text", "lang", "source",
      "n_chars")).count() === 0)

    // a child shares at most ~half its shingles with its first-half parent:
    // Jaccard in the SAME shingle space the dedup gates use (word 3-grams,
    // graft.functions.TextFunctions.shingleSet) must sit well below the
    // 0.8 near-dup threshold — the synthetic corpus's shared vocabulary
    // makes unigram overlap high, but trigram overlap is what LSH sees
    import spark.implicits._
    import graft.functions.TextFunctions.shingleSet
    val pairs = out.where(col("doc_id") >= n && col("doc_id") < 2 * n)
      .select((col("doc_id") - n).as("parent_id"), col("text").as("child"))
      .join(docs.select(col("doc_id").as("parent_id"),
        col("text").as("parent")), "parent_id")
      .select(shingleSet(col("child"), 3).as("cw"),
        shingleSet(col("parent"), 3).as("pw"))
      .select((size(array_intersect($"cw", $"pw")).cast("double") /
        size(array_union($"cw", $"pw"))).as("j"))
    val maxJ = pairs.agg(max($"j")).head().getDouble(0)
    assert(maxJ < 0.6, s"a child is a near-dup of its parent (jaccard $maxJ)")
    out.unpersist()
  }

  test("scaleEmbeddings: norms preserved, copies decorrelated from originals") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = emb.count()
    val out = ScaleUp.scaleEmbeddings(emb, 10).cache()
    assert(out.count() === n * 10)

    import spark.implicits._
    def norm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x * x), lit(0.0d),
        (acc, x) => acc + x))
    // rotation preserves the norm exactly
    val normPairs = out.where(col("vec_id") >= n && col("vec_id") < 2 * n)
      .select((col("vec_id") - n).as("o_id"), norm(col("embedding")).as("cn"))
      .join(emb.select(col("vec_id").as("o_id"),
        norm(col("embedding")).as("on")), "o_id")
    val maxNormDelta = normPairs
      .agg(max(abs($"cn" - $"on"))).head().getDouble(0)
    assert(maxNormDelta < 1e-4)

    // rotated copies are decorrelated: |cos(v, rot(v))| stays far from 1
    val cosPairs = out.where(col("vec_id") >= n && col("vec_id") < 2 * n)
      .select((col("vec_id") - n).as("o_id"), col("embedding").as("ce"))
      .join(emb.select(col("vec_id").as("o_id"), col("embedding").as("oe")),
        "o_id")
      .select((aggregate(zip_with($"ce", $"oe", (a, b) => a * b), lit(0.0d),
        (acc, x) => acc + x) /
        (norm($"ce") * norm($"oe"))).as("cos"))
    val maxCos = cosPairs.agg(max(abs($"cos"))).head().getDouble(0)
    assert(maxCos < 0.9, s"a rotated copy is a cosine twin ($maxCos)")
    out.unpersist()
  }

  test("fact keys offset disjointly; per-copy join structure preserved") {
    val tmp = java.nio.file.Files.createTempDirectory("scaleup").toString
    ScaleUp.scaleDirectory(spark, sf, tmp, 3)
    val li = spark.read.parquet(s"$tmp/lineitem.parquet")
    val ord = spark.read.parquet(s"$tmp/orders.parquet")
    assert(ord.count() === spark.read.parquet(s"$sf/orders.parquet").count() * 3)
    // every lineitem still joins to exactly one order
    val dangling = li.join(ord, li("l_orderkey") === ord("o_orderkey"),
      "left_anti").count()
    assert(dangling === 0)
    // dimensions stay fixed
    assert(spark.read.parquet(s"$tmp/nation.parquet").count() === 25)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
