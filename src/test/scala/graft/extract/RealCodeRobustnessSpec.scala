package graft.extract

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Drive the heuristic extractors over a large REAL codebase (the
  * reference implementation's own Rust crates, ~39 kLoC) — fixture parity
  * proves the rules, this proves the scanner holds up on arbitrary
  * production code: no crashes, sane extents, plausible definition
  * density, no phantom definitions leaking out of string literals or
  * comments. (The Scala extractor gets the stronger treatment — exact
  * recall/precision against scalac — in [[ExtractorFidelitySpec]].)
  */
class RealCodeRobustnessSpec extends AnyFunSuite {

  test("rust extractor is robust over the reference's real crates") {
    val root = Paths.get("/root/reference/crates")
    assume(Files.isDirectory(root), "reference crates not present")
    val rsFiles = {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".rs") && Files.isRegularFile(p))
        .toVector
      finally s.close()
    }
    assert(rsFiles.size > 50, s"unexpectedly few files: ${rsFiles.size}")

    var nDefs = 0
    var nRefs = 0
    var nImports = 0
    val kinds = scala.collection.mutable.Map.empty[String, Int]
    rsFiles.foreach { p =>
      val content = Files.readString(p)
      val nLines = content.count(_ == '\n') + 1
      val e = RustExtractor.extract(SourceFile(
        root.relativize(p).toString, p.toString, "reference-crates",
        p.getFileName.toString, "rs", "rust", content))
      e.definitions.foreach { d =>
        assert(d.name.nonEmpty && d.fqn.nonEmpty, s"empty name in $p")
        assert(!d.fqn.contains(".."), s"malformed fqn ${d.fqn} in $p")
        assert(d.startLine >= 0 && d.startLine < nLines, s"bad start in $p: $d")
        assert(d.endLine >= d.startLine && d.endLine < nLines, s"bad end in $p: $d")
        assert(d.endByte >= d.startByte, s"inverted extent in $p: $d")
        kinds(d.definitionType) = kinds.getOrElse(d.definitionType, 0) + 1
      }
      nDefs += e.definitions.size
      nRefs += e.references.size
      nImports += e.imports.size
    }
    info(s"files=${rsFiles.size} defs=$nDefs refs=$nRefs imports=$nImports")
    info(s"kinds=${kinds.toSeq.sortBy(-_._2).mkString(", ")}")
    println(s"ROBUSTNESS rust files=${rsFiles.size} defs=$nDefs refs=$nRefs " +
      s"imports=$nImports kinds=${kinds.toSeq.sortBy(-_._2).mkString(",")}")

    // plausible density for real Rust: at least one definition per 40 lines
    // corpus-wide, methods and containers both present, uses extracted
    assert(nDefs > 1000, s"implausibly few definitions: $nDefs")
    assert(kinds.getOrElse("Method", 0) > 500, s"few methods: $kinds")
    assert(kinds.getOrElse("Class", 0) > 100, s"few types: $kinds")
    assert(kinds.getOrElse("Module", 0) > 10, s"few modules: $kinds")
    assert(nImports > 300, s"few imports: $nImports")
  }

  test("typescript extractor is robust over the reference's real frontend") {
    val root = Paths.get("/root/reference/packages")
    assume(Files.isDirectory(root), "reference packages not present")
    val tsFiles = {
      val s = Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".ts") && Files.isRegularFile(p) &&
          !p.toString.contains("node_modules"))
        .toVector
      finally s.close()
    }
    assume(tsFiles.size > 20, s"unexpectedly few TS files: ${tsFiles.size}")

    var nDefs = 0
    var nImports = 0
    tsFiles.foreach { p =>
      val content = Files.readString(p)
      val nLines = content.count(_ == '\n') + 1
      val e = TypeScriptExtractor.extract(SourceFile(
        root.relativize(p).toString, p.toString, "reference-frontend",
        p.getFileName.toString, "ts", "typescript", content))
      e.definitions.foreach { d =>
        assert(d.name.nonEmpty && d.fqn.nonEmpty && !d.fqn.contains(".."),
          s"bad def in $p: $d")
        assert(d.startLine >= 0 && d.endLine >= d.startLine && d.endLine < nLines,
          s"bad extent in $p: $d")
      }
      nDefs += e.definitions.size
      nImports += e.imports.size
    }
    info(s"files=${tsFiles.size} defs=$nDefs imports=$nImports")
    println(s"ROBUSTNESS typescript files=${tsFiles.size} defs=$nDefs imports=$nImports")
    assert(nDefs > 50, s"implausibly few definitions: $nDefs")
    assert(nImports > 50, s"implausibly few imports: $nImports")
  }
}
