package graft.analyze

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** EXACT parity with the reference's Python interfile-resolution unit
  * tests (crates/indexer/src/analysis/languages/python/interfile.rs:
  * 219-407): same synthetic file tree, same (import_path, importing file)
  * cases, same expected candidate files — asserted against
  * [[PythonResolver.possibleSymbolLocations]].
  */
class PythonInterfileSpec extends SparkSpec {
  import spark.implicits._

  // interfile.rs:199-216 create_file_tree
  private val treePaths = Seq(
    "src/main.py", "src/utils.py", "src/package/__init__.py",
    "src/package/module.py", "src/package/subpackage/__init__.py",
    "src/package/subpackage/utils.py", "src/package/subpackage/helpers.py",
    "tests/test_main.py", "tests/test_utils.py", "tests/package/__init__.py",
    "tests/package/test_module.py", "root_module.py",
    "root_package/__init__.py", "root_package/module.py")

  private def filesDf(paths: Seq[String]): DataFrame =
    paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "path")

  private def locations(importPath: String, fromFile: String,
      paths: Seq[String] = treePaths): Set[String] = {
    val imps = Seq((0L, "from_import", importPath, "test_symbol", fromFile))
      .toDF("id", "import_type", "import_path", "name", "file_path")
    PythonResolver.possibleSymbolLocations(imps, filesDf(paths))
      .select("path").as[String].collect().toSet
  }

  test("absolute import, simple module (interfile.rs:220)") {
    assert(locations("utils", "src/main.py").contains("src/utils.py"))
  }

  test("absolute import, package module (interfile.rs:236)") {
    assert(locations("package.module", "src/main.py")
      .contains("src/package/module.py"))
  }

  test("relative import, same directory (interfile.rs:257)") {
    assert(locations(".utils", "src/main.py").contains("src/utils.py"))
  }

  test("relative import, parent directory (interfile.rs:271)") {
    assert(locations("..module", "src/package/subpackage/helpers.py")
      .contains("src/package/module.py"))
  }

  test("relative import from __init__.py (interfile.rs:288)") {
    assert(locations(".module", "src/package/__init__.py")
      .contains("src/package/module.py"))
  }

  test("relative import, just dots (interfile.rs:305)") {
    assert(locations("..", "src/package/subpackage/helpers.py")
      .contains("src/package/__init__.py"))
  }

  test("nonexistent absolute module resolves to nothing (interfile.rs:322)") {
    assert(locations("nonexistent.module", "src/main.py").isEmpty)
  }

  test("nonexistent relative module resolves to nothing (interfile.rs:339)") {
    assert(locations(".nonexistent", "src/main.py").isEmpty)
  }

  test("case-insensitive matching returns the real path (interfile.rs:356)") {
    val tree = Seq("src/Utils.py", "src/Package/Module.py")
    assert(locations("utils", "src/main.py", tree) === Set("src/Utils.py"))
  }

  test("duplicate tree entries dedup; empty tree resolves nothing " +
      "(interfile.rs:375,393)") {
    val dup = Seq("src/utils.py", "src/utils.py")
    val got = PythonResolver.possibleSymbolLocations(
      Seq((0L, "from_import", "utils", "x", "src/main.py"))
        .toDF("id", "import_type", "import_path", "name", "file_path"),
      dup.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "path"))
      .select("path").as[String].collect()
    assert(got.toSeq === Seq("src/utils.py")) // one row despite two ids
    assert(locations("utils", "src/main.py", Nil).isEmpty)
  }
}
