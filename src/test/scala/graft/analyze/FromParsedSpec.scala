package graft.analyze

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.extract.{RawDefinition, RawImport, RawReference}
import graft.model.{EdgeKind, RelType}

/** The pre-parsed ingestion path (SURVEY §7.4): hand-built extractor-IR
  * tables — as an external tree-sitter fleet would produce — go straight
  * through A2-A10 via Indexer.fromParsed, with no graft extractor involved.
  */
class FromParsedSpec extends SparkSpec {
  import spark.implicits._

  test("fromParsed builds the full store from external parser output") {
    val fileMeta = Seq(
      ("pkg/mod.py", "/r/pkg/mod.py", "ext", "mod.py", "py", "python"),
      ("pkg/use.py", "/r/pkg/use.py", "ext", "use.py", "py", "python")
    ).toDF("path", "absolutePath", "repositoryName", "name", "extension",
      "language")
    val defs = Seq(
      RawDefinition("pkg/mod.py", "Mod", "Mod", "Class", 0, 400, 1, 40, 0, 0),
      RawDefinition("pkg/mod.py", "Mod.run", "run", "Method", 50, 200, 5, 20, 2, 10),
      RawDefinition("pkg/use.py", "main", "main", "Function", 0, 300, 1, 30, 0, 0)
    ).toDF()
    val imps = Seq(
      RawImport("pkg/use.py", "from_import", "pkg.mod", "Mod", null,
        0, 30, 1, 1, 0, 30)
    ).toDF()
    val refs = Seq( // a call to `run` from inside main
      RawReference("pkg/use.py", "run", "", 120, 130, 12, 4, 12)
    ).toDF()

    val store = Indexer.fromParsed(spark, fileMeta, defs, imps, refs)

    assert(store.files.count() === 2)
    assert(store.directories.select("path").as[String].collect().toSet === Set("pkg"))
    assert(store.definitions.count() === 3)
    // A5: Mod.run nests under Mod with a typed edge
    val nest = store.edges.where(col("kind") === EdgeKind.DefToDef &&
      col("type") === "CLASS_TO_METHOD")
    assert(nest.count() === 1)
    // A6: `from pkg.mod import Mod` resolves to the Mod definition
    val impToDef = store.edges.where(col("kind") === EdgeKind.ImpToDef)
    assert(impToDef.count() === 1)
    // containment edges for every node family
    assert(store.edges.where(col("type") === RelType.FileDefines).count() === 3)
    assert(store.edges.where(col("type") === RelType.FileImports).count() === 1)
    assert(store.edges.where(col("kind") === EdgeKind.DirToFile).count() === 2)
    // ids are dense per table starting at 0
    val ids = store.definitions.select("id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(0L, 1L, 2L))

    // typed Dataset[T] face: compile-time fields, same rows
    val methods = store.typedDefinitions
      .filter(d => d.definition_type == "Method" && d.start_line.exists(_ > 0))
      .map(_.fqn).collect().toSet
    assert(methods === Set("Mod.run"))
    assert(store.typedEdges.filter(_.kind == EdgeKind.DirToFile).count() === 2)
    assert(store.typedFiles.map(_.extension).collect().toSet === Set("py"))
  }
}
