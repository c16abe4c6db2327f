package graft.extract

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5: the fidelity methodology's fourth real parser — the heuristic
  * RustExtractor measured against nightly rustc's own pre-expansion AST
  * ([[RustcGroundTruth]], `-Zunpretty=ast-tree`) over every .rs file
  * shipped in the reference repo (181 files, the engine the reference
  * itself is written in). Completes the set: Scala vs scalac, Java vs
  * javac, Python vs cpython-ast, Rust vs rustc.
  *
  * Call comparison excludes the heuristic's keyword/builtin stoplist on
  * BOTH sides (a naming convention, not a parsing capability — same
  * treatment as the other fidelity specs).
  */
class RustFidelitySpec extends AnyFunSuite {

  private val stop = RustExtractor.keywords

  test("heuristic-vs-rustc-ast fidelity on the reference's .rs corpus") {
    val root = Paths.get("/root/reference")
    assume(Files.isDirectory(root), "reference repo not present")
    assume(RustcGroundTruth.available, "nightly rustc not available")
    val s = Files.walk(root)
    val files =
      try s.iterator().asScala.filter(p =>
        p.toString.endsWith(".rs") && Files.isRegularFile(p)).toVector
      finally s.close()
    assume(files.size >= 50, s"rust corpus too small: ${files.size}")

    val (tDefs, tCallsRaw, bad) = RustcGroundTruth.parse(root, files)
    val good = files.filterNot(p =>
      bad.contains(root.relativize(p).toString.replace('\\', '/')))
    val tDefSet = tDefs.map(d => (d.file, d.fqn, d.kind)).toSet
    assert(tDefSet.size > 500, s"truth unexpectedly small: ${tDefSet.size}")

    val extracted = good.map { p =>
      val rel = root.relativize(p).toString.replace('\\', '/')
      rel -> RustExtractor.extract(SourceFile(rel, p.toString, "rustc",
        p.getFileName.toString, "rs", "rust", Files.readString(p)))
    }
    val hDefSet = extracted.flatMap { case (rel, ex) =>
      ex.definitions.map(d => (rel, d.fqn, d.definitionType)) }.toSet
    val hCalls = extracted.flatMap { case (rel, ex) =>
      ex.references.map(r => (rel, r.name)) }.toSet
      .filterNot(p => stop(p._2))
    val tCalls = tCallsRaw.map(c => (c.file, c.name)).toSet
      .filterNot(p => stop(p._2))

    val dR = (hDefSet & tDefSet).size.toDouble / tDefSet.size
    val dP = (hDefSet & tDefSet).size.toDouble / hDefSet.size
    val cR = (hCalls & tCalls).size.toDouble / tCalls.size
    val cP = (hCalls & tCalls).size.toDouble / hCalls.size

    val missByKind = tDefs.filterNot(d => hDefSet((d.file, d.fqn, d.kind)))
      .groupBy(_.kind).view.mapValues(_.size).toMap
    info(f"corpus: ${good.size} files (${bad.size} unparseable skipped), " +
      f"truth defs=${tDefSet.size}, heuristic defs=${hDefSet.size}")
    info(f"definition recall=${dR * 100}%.1f%% precision=${dP * 100}%.1f%%")
    info(f"call-name recall=${cR * 100}%.1f%% precision=${cP * 100}%.1f%% " +
      f"(truth=${tCalls.size}, heuristic=${hCalls.size})")
    info(s"missing defs by kind: $missByKind")
    println(f"FIDELITY_RS files=${good.size} defRecall=${dR * 100}%.1f " +
      f"defPrecision=${dP * 100}%.1f callRecall=${cR * 100}%.1f " +
      f"callPrecision=${cP * 100}%.1f truthDefs=${tDefSet.size} " +
      f"truthCalls=${tCalls.size} missing=$missByKind")

    // floors just under the measured values (100.0 / 99.9 / 100.0 / 93.3
    // — recorded in COVERAGE.md §E2); the corpus is fixed, so any drop is
    // an extractor regression, not noise
    assert(dR > 0.97, f"rust definition recall collapsed: $dR%.3f")
    assert(dP > 0.97, f"rust definition precision collapsed: $dP%.3f")
    assert(cR > 0.97, f"rust call recall collapsed: $cR%.3f")
    assert(cP > 0.90, f"rust call precision collapsed: $cP%.3f")
  }
}
