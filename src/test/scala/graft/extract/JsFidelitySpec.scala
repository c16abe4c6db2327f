package graft.extract

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5: the fidelity methodology's fifth real parser — the heuristic
  * TypeScript/JS extractor measured against acorn 8 (the ECMAScript parser
  * Node itself ships, [[AcornGroundTruth]]) on its JavaScript side, over
  * npm's own production sources installed on this box
  * (`/usr/lib/node_modules/npm/lib` plus each first-party `@npmcli` dep's
  * `lib` — real-world CommonJS application code, ~37 kLoC). The reference
  * repo itself carries only 2 plain-.js files (its frontend is .ts/.vue,
  * which acorn does not parse), so the npm corpus stands in as the
  * measured-JS body, same role the JDK sources play for
  * [[JavaFidelitySpec]]. Completes the matrix: Scala vs scalac, Java vs
  * javac, Python vs cpython-ast, Rust vs rustc, JS vs acorn; TS type-syntax
  * and Ruby remain fixture-parity-only (no parser on this box).
  */
class JsFidelitySpec extends AnyFunSuite {

  // the heuristic's stoplist (TypeScriptExtractor.keywords) — applied to
  // both call sets so the comparison measures parsing, not the convention
  private val stop = Set("if", "for", "while", "switch", "catch", "return",
    "function", "constructor", "super", "typeof", "new", "import", "require",
    "await", "async", "throw", "yield", "delete", "void")

  test("heuristic-vs-acorn fidelity on npm's JS sources") {
    assume(AcornGroundTruth.available, "node with internal acorn not present")
    val root = Paths.get("/usr/lib/node_modules/npm")
    assume(Files.isDirectory(root), "npm sources not present")
    def jsUnder(dir: Path): Vector[Path] =
      if (!Files.isDirectory(dir)) Vector.empty
      else {
        val s = Files.walk(dir)
        try s.iterator().asScala.filter(p =>
          p.toString.endsWith(".js") && Files.isRegularFile(p)).toVector
        finally s.close()
      }
    val npmcli = root.resolve("node_modules/@npmcli")
    val depLibs =
      if (!Files.isDirectory(npmcli)) Vector.empty
      else {
        val s = Files.list(npmcli)
        try s.iterator().asScala.toVector.flatMap(d => jsUnder(d.resolve("lib")))
        finally s.close()
      }
    val files = (jsUnder(root.resolve("lib")) ++ depLibs).sorted
    assume(files.size >= 50, s"js corpus too small: ${files.size}")

    val (tDefs, tCallsRaw, bad) = AcornGroundTruth.parse(root, files)
    val good = files.filterNot(p =>
      bad.contains(root.relativize(p).toString.replace('\\', '/')))
    val tDefSet = tDefs.map(d => (d.file, d.fqn, d.kind)).toSet
    assert(tDefSet.size > 200, s"truth unexpectedly small: ${tDefSet.size}")

    val extracted = good.map { p =>
      val rel = root.relativize(p).toString.replace('\\', '/')
      rel -> TypeScriptExtractor.extract(SourceFile(rel, p.toString, "npm",
        p.getFileName.toString, "js", "javascript", Files.readString(p)))
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
    println(f"FIDELITY_JS files=${good.size} defRecall=${dR * 100}%.1f " +
      f"defPrecision=${dP * 100}%.1f callRecall=${cR * 100}%.1f " +
      f"callPrecision=${cP * 100}%.1f truthDefs=${tDefSet.size} " +
      f"truthCalls=${tCalls.size} missing=$missByKind")

    // floors just under the measured values (defs 100.0/100.0, calls
    // 99.8/100.0 — COVERAGE.md §E2) so parity cannot silently regress
    assert(dR > 0.97, f"js definition recall collapsed: $dR%.3f")
    assert(dP > 0.97, f"js definition precision collapsed: $dP%.3f")
    assert(cR > 0.97, f"js call recall collapsed: $cR%.3f")
    assert(cP > 0.97, f"js call precision collapsed: $cP%.3f")
  }
}
