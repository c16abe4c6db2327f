package graft.extract

import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5: the ExtractorFidelitySpec methodology extended to Java, with
  * the javac parse API as the real-parser ground truth
  * ([[JavacGroundTruth]]). Preferred corpus: the JDK's own `java.util` +
  * `java.io` sources from src.zip when a JDK-with-sources is installed; on
  * this box src.zip is a dangling symlink (openjdk-17 without the source
  * package), so the corpus falls back to every .java file shipped in the
  * reference implementation's fixtures and test repos — small but real
  * application code, and the VERDICT's stated minimum. Reports definition
  * recall/precision at the extraction level (resolution parity has its own
  * exact fixture suites) and asserts floors so the measurement cannot
  * silently degrade.
  */
class JavaFidelitySpec extends AnyFunSuite {

  private def jdkCorpus(): Option[(Path, Seq[Path])] = {
    val srcZip = Seq(
      Paths.get(System.getProperty("java.home"), "lib", "src.zip"),
      Paths.get("/usr/lib/jvm/java-17-openjdk-amd64/lib/src.zip"))
      .find(Files.isRegularFile(_)).getOrElse { return None }
    val dir = Files.createTempDirectory("graft-jdk-corpus")
    val zf = new ZipFile(srcZip.toFile)
    try {
      val wanted = zf.entries().asScala.filter { e =>
        val n = e.getName
        !e.isDirectory && n.endsWith(".java") &&
          !n.endsWith("module-info.java") && !n.endsWith("package-info.java") &&
          (n.matches("java\\.base/java/util/[^/]+\\.java") ||
           n.matches("java\\.base/java/io/[^/]+\\.java"))
      }.toVector
      val files = wanted.map { e =>
        val rel = e.getName.stripPrefix("java.base/")
        val p = dir.resolve(rel)
        Files.createDirectories(p.getParent)
        val in = zf.getInputStream(e)
        try Files.copy(in, p) finally in.close()
        p
      }
      if (files.size > 150) Some((dir, files)) else None
    } finally zf.close()
  }

  private def referenceCorpus(): Option[(Path, Seq[Path])] = {
    val root = Paths.get("/root/reference")
    if (!Files.isDirectory(root)) return None
    val s = Files.walk(root)
    val files =
      try s.iterator().asScala.filter(p =>
        p.toString.endsWith(".java") && Files.isRegularFile(p)).toVector
      finally s.close()
    if (files.size >= 10) Some((root, files)) else None
  }

  test("heuristic-vs-javac fidelity on a real Java corpus") {
    val corpus = jdkCorpus().orElse(referenceCorpus())
    assume(corpus.isDefined, "no Java corpus present (no src.zip, no reference)")
    val (dir, files) = corpus.get

    // (a) heuristic path — the shipping JavaExtractor, file by file
    val hDefs = files.flatMap { p =>
      val rel = dir.relativize(p).toString.replace('\\', '/')
      JavaExtractor.extract(SourceFile(rel, p.toString, "jdk", // scan contract
        p.getFileName.toString, "java", "java", Files.readString(p)))
        .definitions
    }
    val hFqns = hDefs.map(_.fqn).toSet

    // (b) real-parser path — javac syntax trees lowered to the same FQN
    // conventions
    val truth = JavacGroundTruth.parse(files)
    val tFqns = truth.map(_.fqn).toSet
    assert(tFqns.size > 50, s"truth unexpectedly small: ${tFqns.size}")

    val recall = (hFqns & tFqns).size.toDouble / tFqns.size
    val precision = (hFqns & tFqns).size.toDouble / hFqns.size

    // missing-definition census by kind — WHAT is missed matters as much
    val missingByKind = truth.filterNot(t => hFqns(t.fqn))
      .groupBy(_.kind).view.mapValues(_.size).toMap
    val extras = (hFqns -- tFqns).size

    info(f"corpus: ${files.size} files, truth defs=${tFqns.size}, heuristic defs=${hFqns.size}")
    info(f"definition recall=${recall * 100}%.1f%% precision=${precision * 100}%.1f%%")
    info(s"missing by kind: $missingByKind, heuristic extras: $extras")
    println(f"FIDELITY_JAVA files=${files.size} defRecall=${recall * 100}%.1f " +
      f"defPrecision=${precision * 100}%.1f truthDefs=${tFqns.size} " +
      f"heurDefs=${hFqns.size} missing=$missingByKind extras=$extras")

    // conservative floors (measured values recorded in COVERAGE.md §E2)
    assert(recall > 0.80, f"java definition recall collapsed: $recall%.3f")
    assert(precision > 0.80, f"java definition precision collapsed: $precision%.3f")
  }
}
