package graft.extract

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Diagnostic twin of [[JsFidelitySpec]]: prints every definition
  * disagreement (and a sample of call disagreements) between the heuristic
  * TypeScript/JS extractor and the acorn ground truth, with the source line
  * for each miss, so extractor fixes target real patterns. Test scope; not
  * part of the suite.
  *
  * Run: sbt "Test/runMain graft.extract.JsFidelityDiag"
  */
object JsFidelityDiag {
  def main(args: Array[String]): Unit = {
    val root = Paths.get("/usr/lib/node_modules/npm")
    def jsUnder(dir: Path): Vector[Path] =
      if (!Files.isDirectory(dir)) Vector.empty
      else {
        val s = Files.walk(dir)
        try s.iterator().asScala.filter(p =>
          p.toString.endsWith(".js") && Files.isRegularFile(p)).toVector
        finally s.close()
      }
    val npmcli = root.resolve("node_modules/@npmcli")
    val depLibs = {
      val s = Files.list(npmcli)
      try s.iterator().asScala.toVector.flatMap(d => jsUnder(d.resolve("lib")))
      finally s.close()
    }
    val files = (jsUnder(root.resolve("lib")) ++ depLibs).sorted
    val (tDefs, tCalls, bad) = AcornGroundTruth.parse(root, files)
    val good = files.filterNot(p =>
      bad.contains(root.relativize(p).toString.replace('\\', '/')))

    val extracted = good.map { p =>
      val rel = root.relativize(p).toString.replace('\\', '/')
      rel -> TypeScriptExtractor.extract(SourceFile(rel, p.toString, "npm",
        p.getFileName.toString, "js", "javascript", Files.readString(p)))
    }
    val hDefSet = extracted.flatMap { case (rel, ex) =>
      ex.definitions.map(d => (rel, d.fqn, d.definitionType)) }.toSet
    val tDefSet = tDefs.map(d => (d.file, d.fqn, d.kind)).toSet

    val contents = good.map { p =>
      root.relativize(p).toString.replace('\\', '/') ->
        Files.readString(p).split("\n", -1)
    }.toMap

    def findLine(file: String, name: String): String = {
      val simple = name.split('.').last
      contents.getOrElse(file, Array.empty[String])
        .find(l => l.contains(simple) &&
          (l.contains(simple + "(") || l.contains(simple + " (") ||
           l.contains(simple + " =") || l.contains(simple + "=")))
        .getOrElse("").trim.take(120)
    }

    val missing = tDefs.filterNot(d => hDefSet((d.file, d.fqn, d.kind)))
    println(s"== MISSING (truth-only) defs: ${missing.size}")
    missing.take(80).foreach { d =>
      println(f"${d.kind}%-9s ${d.file}%-60s ${d.fqn}%-40s | ${findLine(d.file, d.fqn)}")
    }
    val extra = hDefSet.filterNot(tDefSet).toSeq.sortBy(x => (x._1, x._2))
    println(s"== EXTRA (heuristic-only) defs: ${extra.size}")
    extra.take(40).foreach { case (f, fqn, k) =>
      println(f"$k%-9s $f%-60s $fqn%-40s | ${findLine(f, fqn)}")
    }

    val stop = Set("if", "for", "while", "switch", "catch", "return",
      "function", "constructor", "super", "typeof", "new", "import", "require",
      "await", "async", "throw", "yield", "delete", "void")
    val hCalls = extracted.flatMap { case (rel, ex) =>
      ex.references.map(r => (rel, r.name)) }.toSet.filterNot(p => stop(p._2))
    val tc = tCalls.map(c => (c.file, c.name)).filterNot(p => stop(p._2))
    val extraCalls = (hCalls -- tc).toSeq.sortBy(identity)
    println(s"== EXTRA calls: ${extraCalls.size}")
    extraCalls.take(60).foreach { case (f, n) => println(s"  $f  $n") }
    val missCalls = (tc -- hCalls).toSeq.sortBy(identity)
    println(s"== MISSING calls: ${missCalls.size}")
    missCalls.take(40).foreach { case (f, n) => println(s"  $f  $n") }
  }
}
