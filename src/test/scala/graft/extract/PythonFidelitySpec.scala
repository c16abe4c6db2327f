package graft.extract

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5: the fidelity methodology's third real parser — the heuristic
  * PythonExtractor measured against CPython's own `ast` module
  * ([[PyAstGroundTruth]]) over every .py file shipped in the reference
  * repo (real pipeline/analysis application code). Completes the set:
  * Scala vs scalac (exact), Java vs javac (exact), Python vs cpython-ast.
  * Call comparison excludes the heuristic's keyword/builtin stoplist on
  * BOTH sides (a naming convention, not a parsing capability — same
  * treatment as ScalacGroundTruth's emission families).
  */
class PythonFidelitySpec extends AnyFunSuite {

  // the heuristic's stoplist (PythonExtractor.keywords) — applied to both
  // call sets so the comparison measures parsing, not the convention
  private val stop = Set("if", "elif", "while", "for", "with", "return",
    "yield", "assert", "def", "class", "lambda", "not", "and", "or", "in",
    "is", "except", "raise", "del", "print")

  test("heuristic-vs-cpython-ast fidelity on the reference's .py corpus") {
    val root = Paths.get("/root/reference")
    assume(Files.isDirectory(root), "reference repo not present")
    val s = Files.walk(root)
    val files =
      try s.iterator().asScala.filter(p =>
        p.toString.endsWith(".py") && Files.isRegularFile(p)).toVector
      finally s.close()
    assume(files.size >= 10, s"python corpus too small: ${files.size}")

    val (tDefs, tCallsRaw, bad) = PyAstGroundTruth.parse(root, files)
    val good = files.filterNot(p =>
      bad.contains(root.relativize(p).toString.replace('\\', '/')))
    val tDefSet = tDefs.map(d => (d.file, d.fqn, d.kind)).toSet
    assert(tDefSet.size > 100, s"truth unexpectedly small: ${tDefSet.size}")

    val extracted = good.map { p =>
      val rel = root.relativize(p).toString.replace('\\', '/')
      rel -> PythonExtractor.extract(SourceFile(rel, p.toString, "pyast",
        p.getFileName.toString, "py", "python", Files.readString(p)))
    }
    val hDefSet = extracted.flatMap { case (rel, ex) =>
      ex.definitions.map(d => (rel, d.fqn, d.definitionType)) }.toSet
    val hCalls = extracted.flatMap { case (rel, ex) =>
      ex.references.map(r => (rel, r.name)) }.toSet
      .filterNot(p => stop(p._2))
    val tCalls = tCallsRaw.map(c => (c.file, c.name))
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
    println(f"FIDELITY_PY files=${good.size} defRecall=${dR * 100}%.1f " +
      f"defPrecision=${dP * 100}%.1f callRecall=${cR * 100}%.1f " +
      f"callPrecision=${cP * 100}%.1f truthDefs=${tDefSet.size} " +
      f"truthCalls=${tCalls.size} missing=$missByKind")

    // conservative floors (measured values recorded in COVERAGE.md §E2)
    assert(dR > 0.80, f"python definition recall collapsed: $dR%.3f")
    assert(dP > 0.80, f"python definition precision collapsed: $dP%.3f")
    assert(cR > 0.70, f"python call recall collapsed: $cR%.3f")
    assert(cP > 0.70, f"python call precision collapsed: $cP%.3f")
  }
}
