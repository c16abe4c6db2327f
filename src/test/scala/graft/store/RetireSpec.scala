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

  test("AnnIndexStore.retire: retired vectors vanish from probes (full " +
    "probe == brute force over survivors); compact purges and reopens ids") {
    val embs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory("graft-ret-ann").toString + "/idx"
    val idx = AnnIndexStore.build(spark, dir, embs, "vec_id", "embedding",
      nlist = 8, lloydIters = 2)
    val queries = embs.where(col("vec_id") < 10)
    def got = idx.topK(queries, "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap

    idx.retire(embs.where(col("vec_id") % 7 === 0 && col("vec_id") >= 10)
      .select("vec_id"), "vec_id")
    val after = got
    assert(!after.values.exists(v => v % 7 == 0 && v >= 10),
      "retired vectors must stop appearing as neighbors")
    // probing ALL cells makes IVF exact, so the retired store must equal
    // brute-force cosine over the survivors — the independent oracle
    val survivors = embs.where(!(col("vec_id") % 7 === 0 &&
      col("vec_id") >= 10))
    val brute = graft.pipeline.Similarity
      .bruteForceTopK(queries, survivors, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(after == brute,
      "retired index must score exactly like the survivor set")

    // idempotent
    idx.retire(embs.where(col("vec_id") % 7 === 0 && col("vec_id") >= 10)
      .select("vec_id"), "vec_id")
    assert(got == after)

    // compact purges the rows physically and frees the ids
    idx.compact()
    assert(idx.retired.isEmpty)
    assert(StoreCompaction.read(spark, s"$dir/cells")
      .where(col("vid") % 7 === 0 && col("vid") >= 10).isEmpty,
      "compact must purge retired cell rows")
    assert(got == after, "compaction must not change probe results")
    idx.append(embs.where(col("vec_id") % 7 === 0 && col("vec_id") >= 10),
      "vec_id", "embedding")
    val back = got
    val bruteAll = graft.pipeline.Similarity
      .bruteForceTopK(queries, embs, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(back == bruteAll,
      "re-admission after compact must equal the full corpus")
  }

  test("CorpusStore.retire: loader view and manifest shrink together, " +
    "equal to a survivors-only publish; compact purges and reopens ids") {
    val dir = Files.createTempDirectory("graft-ret-corp").toString + "/c"
    CorpusStore.write(spark, dir, docs, "doc_id", "text", nShards = 4)
    CorpusStore.retire(spark, dir,
      docs.where(col("doc_id") % 5 === 0).select("doc_id"), "doc_id", "text")

    assert(CorpusStore.docs(spark, dir).where(col("doc_id") % 5 === 0)
      .isEmpty, "retired docs must leave the loader view")
    assert(CorpusStore.validate(spark, dir, "doc_id", "text") == 0L,
      "manifest must track the live view exactly after retire")
    // manifest == a fresh publish of the survivors (same shard function)
    val survDir = Files.createTempDirectory("graft-ret-corp2").toString + "/c"
    val survMf = CorpusStore.write(spark, survDir,
      docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text", nShards = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mf = CorpusStore.manifest(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mf == survMf, "retired manifest must equal a survivors publish")

    // idempotent: re-retiring changes nothing
    CorpusStore.retire(spark, dir,
      docs.where(col("doc_id") % 5 === 0).select("doc_id"), "doc_id", "text")
    assert(CorpusStore.manifest(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      == mf && CorpusStore.validate(spark, dir, "doc_id", "text") == 0L)

    // compact: physical purge, tombstones dropped, ids re-admittable
    CorpusStore.compact(spark, dir)
    assert(CorpusStore.retired(spark, dir).isEmpty)
    assert(StoreCompaction.read(spark, s"$dir/docs")
      .where(col("doc_id") % 5 === 0)
      .isEmpty, "compact must purge retired rows")
    assert(CorpusStore.validate(spark, dir, "doc_id", "text") == 0L)
    CorpusStore.append(spark, dir, docs.where(col("doc_id") % 5 === 0),
      "doc_id", "text")
    assert(CorpusStore.validate(spark, dir, "doc_id", "text") == 0L)
    assert(CorpusStore.docs(spark, dir).count() == docs.count(),
      "re-admission after compact must restore the full corpus")
  }

  test("CmStore.retireBatch: exact batch deletion by linearity; item " +
    "deletion impossible; folded batches refuse and demand a rebuild") {
    val dir = Files.createTempDirectory("graft-ret-cm").toString + "/cm"
    val b1 = docs.where(col("doc_id") % 3 === 0)
    val b2 = docs.where(col("doc_id") % 3 === 1)
    val b3 = docs.where(col("doc_id") % 3 === 2)
    val st = CmStore.build(spark, dir, b1, "text", depth = 4, width = 256)
    assert(st.append(b2, "b2") && st.append(b3, "b3"))

    assert(!st.retireBatch("no_such_batch"))
    assert(st.retireBatch("b2"),
      "an admitted, unfolded batch must be retirable")
    // exact: estimates equal a store that never saw b2
    val cmpDir = Files.createTempDirectory("graft-ret-cm2").toString + "/cm"
    val cmp = CmStore.build(spark, cmpDir, b1, "text", depth = 4, width = 256)
    assert(cmp.append(b3, "b3"))
    val probe = docs.where(col("doc_id") < 50).select("text")
    def est(s: CmStore) = s.estimate(probe, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est(st) == est(cmp),
      "retireBatch must be exact — estimates equal never-admitted")
    assert(st.totalItems == cmp.totalItems)

    // the retired key is re-admittable (the guard left with the batch)
    assert(st.append(b2, "b2"), "retired key must be free for re-admission")

    // after compact the batch is folded: retire must refuse with the
    // rebuild instruction, and the replay guard must still hold
    st.compact()
    val e = intercept[IllegalArgumentException](st.retireBatch("b2"))
    assert(e.getMessage.contains("folded by compaction"))
    assert(!st.append(b2, "b2"), "guards must survive the refusal")
  }

  test("Bloom and HLL stores: not deletable by construction — the " +
    "deletion path is rebuild from survivors, equal to a fresh build") {
    val survivors = docs.where(col("doc_id") % 5 =!= 0)
    // Bloom: OR-fold — rebuild(survivors) is bit-identical to build(survivors)
    val bDir = Files.createTempDirectory("graft-ret-bloom").toString + "/b"
    val bl = BloomStore.build(spark, bDir, docs, "doc_id", k = 3,
      width = 1024)
    bl.rebuild(survivors)
    val fDir = Files.createTempDirectory("graft-ret-bloom2").toString + "/b"
    val fresh = BloomStore.build(spark, fDir, survivors, "doc_id", k = 3,
      width = 1024)
    assert(bl.bits.collect().map(_.getLong(0)).toSet ==
      fresh.bits.collect().map(_.getLong(0)).toSet,
      "bloom rebuild must be bit-identical to a survivors-only build")

    // HLL: max-fold — rebuild(survivors) estimates equal build(survivors)
    val full = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val sDir = Files.createTempDirectory("graft-ret-hll").toString + "/s"
    val sk = SketchStore.build(spark, sDir, full, "source", "doc_id")
    sk.rebuild(full.where(col("doc_id") % 5 =!= 0))
    val s2Dir = Files.createTempDirectory("graft-ret-hll2").toString + "/s"
    val freshSk = SketchStore.build(spark, s2Dir,
      full.where(col("doc_id") % 5 =!= 0), "source", "doc_id")
    def ests(s: SketchStore) = s.estimates.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ests(sk) == ests(freshSk),
      "hll rebuild must estimate identically to a survivors-only build")
  }
}
