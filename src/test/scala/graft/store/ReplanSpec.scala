package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.Dedup

/** Corpus-drift re-plan at compaction (round-13 item): an AUTO-planned
  * band family is priced once, at build, against that corpus's size and
  * sampled pair-similarity mass — a store built small and grown several
  * times over by appends keeps the stale family forever, paying its
  * collision rate on every adopted-family query. [[DedupIndexStore
  * .compact]] re-prices the family from the STORED shingle sets (no
  * re-shingling of history) and re-signs the band table when the planner's
  * choice changed. Pinned here: the re-planned store's family AND its
  * adopted-family query answers equal a fresh auto build over the same
  * live corpus, and explicit-family stores never re-plan.
  */
class ReplanSpec extends SparkSpec {
  import spark.implicits._

  // low-similarity filler: per-doc distinct character soup, so the initial
  // small corpus prices a cheap family (r = 2)
  private def plainDocs(ids: Range) = ids.map { i =>
    val h = java.lang.Long.toHexString(i.toLong * 2654435761L + 17)
    (i.toLong, s"plain $h document ${h.reverse} body $i " * 4)
  }.toDF("doc_id", "text")

  // mid-similarity siblings: each pair (a_i, b_i) shares roughly half its
  // shingles (j ≈ 1/3, well below a 0.8 threshold) — the sub-threshold
  // mass that forces the planner to a deeper rows-per-band at scale
  private def twinDocs(ids: Range, base: Int) = ids.flatMap { i =>
    val shared = s"common segment ${java.lang.Long.toHexString(
      i.toLong * 1099511628211L)} shared across the sibling pair " * 3
    val ua = s"alpha unique ${i * 31 + 7} part " * 3
    val ub = s"beta unique ${i * 53 + 11} slice " * 3
    Seq((base + 2L * i, ua + shared), (base + 2L * i + 1, ub + shared))
  }.toDF("doc_id", "text")

  test("a store grown past its priced corpus re-plans at compact: family " +
    "and adopted-family pairs equal a fresh auto build; explicit-family " +
    "stores stay byte-stable") {
    val dir = Files.createTempDirectory("graft-replan").toString + "/idx"
    val initial = plainDocs(0 until 60)
    val st = DedupIndexStore.build(spark, dir, initial, "doc_id", "text",
      numHashes = 0, bands = 0, threshold = 0.8)
    val before = st.params
    assert(st.autoPlanned, "numHashes = 0 build must record auto")

    // grow ~10x with heavy mid-similarity mass (appends keep the stale
    // family by design — only compact re-prices)
    val growth = twinDocs(0 until 270, base = 1000)
    st.append(growth, "doc_id", "text", autoCompactFiles = 0)
    assert(st.params == before, "appends must not re-plan")

    st.compact()
    val after = st.params
    assert(after != before,
      s"the grown corpus must re-price the family (stayed $before)")

    // parity with a fresh auto build over the same live corpus
    val freshDir = Files.createTempDirectory("graft-replan2").toString + "/idx"
    val full = initial.unionByName(growth)
    val fresh = DedupIndexStore.build(spark, freshDir, full, "doc_id",
      "text", numHashes = 0, bands = 0, threshold = 0.8)
    assert(after == fresh.params,
      s"re-plan must adopt the fresh-build family: $after vs ${fresh.params}")

    // adopted-family query answers are identical: near-dup probes of
    // corpus docs plus unrelated noise
    val probe = full.where(col("doc_id").isin(3L, 1000L, 1001L, 1042L))
      .select(col("doc_id") + 9000, concat(col("text"), lit(" tail")))
      .toDF("doc_id", "text")
      .unionByName(plainDocs(500 until 510)
        .select(col("doc_id") + 9500, col("text")).toDF("doc_id", "text"))
    def pairsOf(ix: DedupIndexStore) =
      Dedup.crossCorpusPairsIndexed(probe, "doc_id", "text", ix,
        numHashes = 0, bands = 0, threshold = 0.8)
        .select("new_id", "seen_id", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    val got = pairsOf(st)
    assert(got == pairsOf(fresh),
      "re-planned store must answer exactly like the fresh build")
    assert(got.nonEmpty, "the probe must actually match (non-vacuous)")

    // explicit-family stores are an operator contract: compact leaves the
    // family untouched even under the same growth
    val fixDir = Files.createTempDirectory("graft-replan3").toString + "/idx"
    val fixed = DedupIndexStore.build(spark, fixDir, initial, "doc_id",
      "text", numHashes = 16, bands = 8)
    fixed.append(growth, "doc_id", "text", autoCompactFiles = 0)
    fixed.compact()
    assert(fixed.params == ((3, 16, 8)),
      "an explicit family must survive compaction unchanged")
  }
}
