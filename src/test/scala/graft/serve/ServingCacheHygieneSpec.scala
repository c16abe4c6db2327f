package graft.serve

import java.nio.file.Files

import graft.SparkSpec
import graft.analyze.Indexer
import graft.query.QueryLibrary
import graft.store.GraphStore

/** Serving-session cache hygiene (the McpServer `index_project` /
  * WorkspaceManager watch-loop shape): a long-lived server queries a
  * cacheAll'd store, a reindex OVERWRITES the store directory, and the
  * server re-reads and re-queries — all in one session, with every cached
  * block evicted in between (the memory-pressure state in which Spark's
  * CacheManager would substitute a stale registered fragment and recompute
  * it from the pre-reindex file listing). GraphStore.write's path-scoped
  * drain must make the post-reindex queries serve the FRESH graph.
  */
class ServingCacheHygieneSpec extends SparkSpec {

  private def writeRepo(root: java.nio.file.Path, extra: Boolean): Unit = {
    def put(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    put("app/models.py",
      """class Base:
        |    def save(self):
        |        pass
        |
        |def helper(x):
        |    return x
        |""".stripMargin)
    put("main.py",
      """from app.models import helper
        |
        |def main():
        |    helper(1)
        |""".stripMargin)
    if (extra)
      put("app/extra.py",
        """def extra_one():
          |    return 1
          |
          |def extra_two():
          |    return 2
          |""".stripMargin)
  }

  test("query → reindex (store overwrite) → re-query in one session under " +
    "forced eviction serves the fresh graph, not a stale cached listing") {
    val repo = Files.createTempDirectory("graft-hyg-repo")
    val storeDir = Files.createTempDirectory("graft-hyg-store").toString

    writeRepo(repo, extra = false)
    Indexer.indexDirectory(spark, repo.toString, "hyg").write(storeDir)
    // serving session: read + cacheAll (registers the cached tables),
    // answer a request (forces the caches)
    val lib1 = new QueryLibrary(GraphStore.read(spark, storeDir).cacheAll())
    val defs1 = lib1.graphStats().head().getAs[Long]("definition_count")

    // memory pressure: every cached block evicted at the RDD level — the
    // SQL-registry entries survive, which is exactly the hazard state
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    // the reindex: two more definitions land, the store dir is REWRITTEN
    writeRepo(repo, extra = true)
    Indexer.indexDirectory(spark, repo.toString, "hyg").write(storeDir)

    // the server re-serves (McpServer rebuilds its QueryLibrary like this)
    val lib2 = new QueryLibrary(GraphStore.read(spark, storeDir).cacheAll())
    val defs2 = lib2.graphStats().head().getAs[Long]("definition_count")
    assert(defs2 == defs1 + 2,
      s"post-reindex stats must reflect the fresh store: $defs1 -> $defs2")
    // and a content query sees the new file's definitions
    val hits = lib2.searchDefinitions(Seq("extra"), 0, 10).collect()
    assert(hits.length == 2, s"expected the 2 new defs, got ${hits.length}")
  }
}
