package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deletion faces of the persisted stores: retire-then-validate equals a
  * rebuild from the survivors, retirement is idempotent, and compaction
  * folds the tombstones physically (freeing ids for re-admission).
  */
class RetireSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("SearchIndexStore.retire: scoring equals a survivors-only rebuild, " +
    "meta stays exact, compact purges and reopens the ids") {
    val dir = Files.createTempDirectory("graft-ret-bm25").toString + "/idx"
    val st = SearchIndexStore.build(spark, dir,
      docs.where(col("doc_id") % 3 =!= 2), "doc_id", "text")
    st.append(docs.where(col("doc_id") % 3 === 2), "doc_id", "text")
    st.retire(docs.where(col("doc_id") % 5 === 0), "doc_id")
    assert(st.validate(), "retire must keep meta and live views consistent")

    val survivors = docs.where(col("doc_id") % 5 =!= 0)
    val fullDir = Files.createTempDirectory("graft-ret-bm25f").toString + "/idx"
    val full = SearchIndexStore.build(spark, fullDir, survivors,
      "doc_id", "text")
    val terms = Seq("spark", "join", "window", "fast")
    assert(st.topK(terms, 10).collect().toSeq ==
      full.topK(terms, 10).collect().toSeq,
      "retired index must score exactly like a survivors-only build")
    assert(st.stats == full.stats, "corpus scalars must match exactly")

    // idempotent: re-retiring changes nothing
    val before = st.stats
    st.retire(docs.where(col("doc_id") % 5 === 0), "doc_id")
    assert(st.stats == before && st.validate())

    // retired ids stay in the replay-guard set until compaction
    assert(st.admittedDocIds.count() == docs.count())

    // compact folds the tombstones: physical rows gone, ids fresh again
    st.compact()
    assert(st.validate())
    assert(StoreCompaction.read(spark, s"$dir/doclens")
      .where(col("doc_id") % 5 === 0).isEmpty, "compact must purge rows")
    assert(st.admittedDocIds.where(col("doc_id") % 5 === 0).isEmpty)
    st.append(docs.where(col("doc_id") % 5 === 0), "doc_id", "text")
    assert(st.validate())
    val reDir = Files.createTempDirectory("graft-ret-bm25r").toString + "/idx"
    val reFull = SearchIndexStore.build(spark, reDir, docs, "doc_id", "text")
    assert(st.topK(terms, 10).collect().toSeq ==
      reFull.topK(terms, 10).collect().toSeq,
      "re-admission after compact must equal the full corpus")
  }

  test("DedupIndexStore.retire: retired docs stop matching, equal to a " +
    "survivors-only index; compact purges") {
    val dir = Files.createTempDirectory("graft-ret-dd").toString + "/idx"
    val words = (0 until 40).map(i => s"w$i").mkString(" ")
    def variant(last: String) = words + " " + last
    val seen = Seq(
      (10L, variant("alpha")), (20L, variant("beta")),
      (30L, variant("gamma"))).toDF("doc_id", "text")
    val idx = DedupIndexStore.build(spark, dir, seen, "doc_id", "text")
    val fresh = Seq((11L, variant("delta"))).toDF("doc_id", "text")
    def hits = graft.pipeline.Dedup
      .crossCorpusPairsIndexed(fresh, "doc_id", "text", idx)
      .orderBy("seen_id").collect().map(_.getLong(1)).toSeq
    assert(hits == Seq(10L, 20L, 30L))

    idx.retire(Seq(20L).toDF("doc_id"), "doc_id")
    assert(hits == Seq(10L, 30L),
      "a retired doc must stop generating candidates")
    // identical to an index never containing doc 20
    val survDir = Files.createTempDirectory("graft-ret-dd2").toString + "/idx"
    val surv = DedupIndexStore.build(spark, survDir,
      seen.where(col("doc_id") =!= 20L), "doc_id", "text")
    assert(graft.pipeline.Dedup
      .crossCorpusPairsIndexed(fresh, "doc_id", "text", surv)
      .orderBy("seen_id").collect().map(_.getLong(1)).toSeq == hits)

    idx.compact()
    assert(StoreCompaction.read(spark, s"$dir/shingles")
      .where(col("doc_id") === 20L).isEmpty, "compact must purge rows")
    assert(idx.retired.isEmpty)
    assert(hits == Seq(10L, 30L))
  }

  test("TriangleStore.retire: negative wedge delta maintains the exact " +
    "census; equals a rebuild from survivors; replay removes nothing") {
    def edgeDf(pairs: (Long, Long)*) =
      pairs.map { case (s, t) => ("DEF_TO_DEF", s, t) }
        .toDF("kind", "source_id", "target_id")
    val dir = Files.createTempDirectory("graft-ret-tri").toString + "/s"
    // K4 on {1,2,3,4} plus pendant 4-5: 6 edges + 1, 4 triangles
    val all = edgeDf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val st = TriangleStore.build(spark, dir, all)
    assert(st.stats == ((7L, 4L)))

    // retiring edge 1-2 destroys triangles 1-2-3 and 1-2-4; an absent
    // edge (5-6) rides along and must remove nothing
    assert(st.retire(edgeDf((1L, 2L), (5L, 6L))) == ((1L, 2L)))
    assert(st.stats == ((6L, 2L)))
    assert(st.validate(),
      "retire-then-validate must equal a survivors recount")

    // replayed retirement is a no-op
    assert(st.retire(edgeDf((1L, 2L))) == ((0L, 0L)))
    assert(st.stats == ((6L, 2L)))

    // interleave: admitting the edge back restores the census
    assert(st.admit(edgeDf((1L, 2L))) == ((1L, 2L)))
    assert(st.stats == ((7L, 4L)) && st.validate())

    // retire a batch destroying overlapping triangles: 1-3 and 3-4 kill
    // 1-2-3, 1-3-4, 2-3-4 (and 1-2-4 survives)
    assert(st.retire(edgeDf((1L, 3L), (3L, 4L))) == ((2L, 3L)))
    assert(st.stats == ((5L, 1L)) && st.validate())
  }
}
