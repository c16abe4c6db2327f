package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.analyze.Indexer
import graft.model.{EdgeKind, RelType}

/** Indexes the reference's own fixture corpora (read-only at
  * /root/reference/fixtures — the golden inputs its language-analyzer tests
  * assert against, SURVEY §5) and checks the structural invariants our
  * heuristic extractors must uphold on real-world code: files detected per
  * language, definitions with containment edges, imports where the corpus
  * has them. Exact-count parity with tree-sitter is not claimed (FIXTURES.md
  * §1) — these are shape checks on real inputs, complementing IndexerSpec's
  * exact assertions on synthetic trees.
  */
class ReferenceFixturesSpec extends SparkSpec {

  private val fixtures = new File("/root/reference/fixtures")

  private def indexed(sub: String) =
    Indexer.indexDirectory(spark, new File(fixtures, sub).getPath, sub)

  // (fixture dir, expected language, expect imports?)
  private val corpora = Seq(
    ("test-repo", "ruby", true),
    ("ruby-references", "ruby", false),
    ("kotlin", "kotlin", true),
    ("java", "java", true),
    ("java-user-service", "java", true),
    ("typescript", "typescript", true))

  corpora.foreach { case (dir, lang, expectImports) =>
    test(s"reference fixture '$dir': files, definitions, containment edges") {
      assume(fixtures.isDirectory, "reference fixtures not present")
      val store = indexed(dir)
      val nFiles = store.files.where(col("language") === lang).count()
      assert(nFiles > 0, s"no $lang files detected in $dir")
      val nDefs = store.definitions.count()
      assert(nDefs > 0, s"no definitions extracted from $dir")
      val fileDefines = store.edges
        .where(col("kind") === EdgeKind.FileToDef &&
          col("type") === RelType.FileDefines).count()
      assert(fileDefines === nDefs, "every definition belongs to a file")
      // real-world trees nest definitions (methods in classes etc.)
      val nesting = store.edges.where(col("kind") === EdgeKind.DefToDef &&
        col("type").contains("_TO_")).count()
      assert(nesting > 0, s"no nesting edges derived in $dir")
      if (expectImports)
        assert(store.importedSymbols.count() > 0, s"no imports found in $dir")
    }
  }

  test("reference Ruby test-repo: EXACT node/containment parity with the " +
    "reference's own end-to-end expectations (indexer/src/tests.rs:924-958)") {
    assume(fixtures.isDirectory, "reference fixtures not present")
    val store = indexed("test-repo")
    assert(store.definitions.count() === 96) // tests.rs:924
    assert(store.files.count() === 7) // tests.rs:929
    assert(store.directories.count() === 4) // tests.rs:946
    assert(store.edges.where(col("type") === RelType.FileDefines)
      .count() === 96) // tests.rs:941
    assert(store.edges.where(col("type") === RelType.DirContainsFile)
      .count() === 6) // tests.rs:952
    assert(store.edges.where(col("type") === RelType.DirContainsDir)
      .count() === 2) // tests.rs:958
    // reference edges resolve on real Ruby (tests.rs:935,965 asserts richer
    // tree-sitter-backed counts; the heuristic extractor must produce all
    // three reference edge families with correct classification)
    assert(store.edges.where(col("type") === RelType.Calls).count() > 0)
    assert(store.edges.where(col("type") === RelType.AmbiguouslyCalls)
      .count() > 0)
    assert(store.edges.where(col("type") === RelType.PropertyReference)
      .count() > 0)
  }

  test("self-indexing: the engine indexes its own Scala sources") {
    val src = new File("src/main/scala/graft")
    assume(src.isDirectory, "run from the repo root")
    val store = Indexer.indexDirectory(spark, src.getPath, "graft")
    assert(store.files.where(col("language") === "scala").count() > 20)
    val fqns = store.definitions.select("fqn").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().toSet
    // a few load-bearing objects and methods must be found
    assert(fqns.contains("QueryLibrary"))
    assert(fqns.contains("Dedup"))
    assert(fqns.exists(_.endsWith("Dedup.minhashLshPairs")))
    assert(fqns.exists(_.endsWith("GraphStore.write")))
    // nesting edges derived from object.method FQNs
    assert(store.edges.where(col("kind") === EdgeKind.DefToDef).count() > 100)
  }

  test("reference Ruby test-repo: defs carry plausible positions and FQNs") {
    assume(fixtures.isDirectory, "reference fixtures not present")
    val store = indexed("test-repo")
    val defs = store.definitions
    assert(defs.where(col("start_line") <= 0).count() === 0)
    assert(defs.where(col("end_line") < col("start_line")).count() === 0)
    assert(defs.where(col("fqn").isNull || col("fqn") === "").count() === 0)
    // nested FQNs exist (Module.method / Class#method shapes)
    assert(defs.where(col("fqn").contains(".")).count() > 0)
  }
}
