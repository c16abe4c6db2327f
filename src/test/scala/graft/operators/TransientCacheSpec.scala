package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TransientCache: the registry that lets rerunnable faces drop operator-
  * internal cached fragments (CacheManager entries included — the part an
  * RDD-level unpersist sweep misses, which is what turned evicted blocks
  * into stale-file-listing recomputes at sf10).
  */
class TransientCacheSpec extends SparkSpec {
  import spark.implicits._

  test("cache registers + persists; drain unpersists and empties") {
    val df = (1 to 100).toDF("x").select(col("x") * 2 as "y")
    val cached = TransientCache.cache(df)
    assert(cached eq df)
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    df.count()
    TransientCache.drain()
    assert(df.storageLevel == StorageLevel.NONE)
    TransientCache.drain() // double drain is a no-op
  }

  test("a drained fragment is recomputed fresh after a store rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tcache")
      .toString + "/t"
    (1 to 50).toDF("v").write.parquet(dir)
    val frag = spark.read.parquet(dir).select(sum("v"))
    TransientCache.cache(frag)
    assert(frag.head().getLong(0) == 1275L)
    // free blocks the way Bench's RDD sweep would, then drain (the fix)
    spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(false))
    TransientCache.drain()
    (51 to 60).toDF("v").write.mode("overwrite").parquet(dir)
    val frag2 = spark.read.parquet(dir).select(sum("v"))
    assert(frag2.head().getLong(0) == 555L) // fresh data, no stale plan
  }

  test("drainPath drops only fragments whose plans read under the mutated " +
    "dir — unrelated warm caches survive") {
    val root = java.nio.file.Files.createTempDirectory("graft-tscope")
      .toString
    (1 to 50).toDF("v").write.parquet(s"$root/storeA/part")
    (1 to 50).toDF("v").write.parquet(s"$root/storeB")
    val overA = TransientCache.cache(
      spark.read.parquet(s"$root/storeA/part").select(sum("v").as("s")))
    val overB = TransientCache.cache(
      spark.read.parquet(s"$root/storeB").select(sum("v").as("s")))
    val pureMem = TransientCache.cache((1 to 10).toDF("x"))
    Seq(overA, overB, pureMem).foreach(_.count())
    // mutating the PARENT of a read path must drain the child's fragment
    TransientCache.drainPath(s"$root/storeA")
    assert(overA.storageLevel == StorageLevel.NONE, "storeA fragment drained")
    assert(overB.storageLevel != StorageLevel.NONE, "storeB cache survives")
    assert(pureMem.storageLevel != StorageLevel.NONE, "file-free cache survives")
    // and mutating a CHILD of a read root drains the wildcard-style reader
    val overRootB = TransientCache.cache(
      spark.read.parquet(s"$root/storeB").select(count(lit(1))))
    overRootB.count()
    TransientCache.drainPath(s"$root/storeB/sub")
    assert(overRootB.storageLevel == StorageLevel.NONE)
    TransientCache.drain()
  }

  test("a fragment reading through a V2 file source is still path-drained " +
    "(DSv2 relations contribute their fileIndex root paths)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tcv2")
      .toString + "/t"
    (1 to 50).toDF("v").write.parquet(dir)
    val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val frag = TransientCache.cache(
        spark.read.parquet(dir).select(sum("v").as("s")))
      // the premise: with parquet off the V1 list this plan really is a
      // DataSourceV2Relation leaf (else the test silently re-covers V1)
      assert(frag.queryExecution.analyzed.collectLeaves().exists(
        _.getClass.getSimpleName == "DataSourceV2Relation"),
        "expected a DSv2 leaf under useV1SourceList=\"\"")
      frag.count()
      // an unrelated path must NOT drain it (paths were extracted, not
      // conservatively None)
      TransientCache.drainPath(dir + "_elsewhere")
      assert(frag.storageLevel != StorageLevel.NONE,
        "V2 fragment over-drained: paths fell back to None")
      TransientCache.drainPath(dir)
      assert(frag.storageLevel == StorageLevel.NONE,
        "V2 fragment not drained by its own store path")
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prev)
      TransientCache.drain()
    }
  }

  test("drainScope drops only the registering driver's scope — a " +
    "concurrent driver's registrations survive, nested scopes drain with " +
    "their parent") {
    // distinct data per frame: identical-data frames CANONICALIZE to the
    // same plan, so the CacheManager would share ONE cache entry across
    // them and unpersisting any drops all — the spec must not conflate
    // that with scope behavior
    val mark = TransientCache.beginScope()
    val mine = TransientCache.cache((1 to 10).toDF("a").select(sum("a")))
    mine.count()
    // a second driver on its own thread registers AFTER this mark — the
    // global-sequence semantics would have swept it with our scope
    @volatile var other: org.apache.spark.sql.DataFrame = null
    val t = new Thread(() => {
      other = TransientCache.cache((11 to 20).toDF("b").select(sum("b")))
      other.count()
    })
    t.start(); t.join()
    // a nested scope opened by our own run: its fragments carry the outer
    // mark too, so an outer drain reclaims them even if the nested drain
    // never ran (aborted mid-run)
    TransientCache.beginScope()
    val nested = TransientCache.cache((21 to 30).toDF("c").select(sum("c")))
    nested.count()
    TransientCache.drainScope(mark)
    assert(mine.storageLevel == StorageLevel.NONE, "own fragment drained")
    assert(nested.storageLevel == StorageLevel.NONE,
      "nested-scope fragment drains with the parent scope")
    assert(other.storageLevel != StorageLevel.NONE,
      "concurrent driver's cache must survive a foreign drainScope")
    TransientCache.drain()
  }

  test("dedup faces leave no registered transient caches after drain") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "x y z w q r s")).toDF("doc_id", "text")
    val pairs = graft.pipeline.Dedup.minhashLshPairs(
      docs, "doc_id", "text", n = 3, numHashes = 16, bands = 8,
      threshold = 0.8)
    pairs.count()
    TransientCache.drain()
    // every cache the face registered is gone — nothing persisted at the
    // SQL level remains from this query (the graph-store caches of other
    // suites may exist; assert on OUR fragment by re-running the face and
    // checking the registry drains to empty without error)
    graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numHashes = 16, bands = 8, threshold = 0.8).count()
    TransientCache.drain()
  }
}
