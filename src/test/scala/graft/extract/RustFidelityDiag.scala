package graft.extract

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Ad-hoc mismatch lister for the Rust fidelity measurement (test scope).
  * Usage: Test/runMain graft.extract.RustFidelityDiag [defs|calls] [limit]
  */
object RustFidelityDiag {
  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("defs")
    val limit = args.lift(1).map(_.toInt).getOrElse(60)
    val root = Paths.get("/root/reference")
    val s = Files.walk(root)
    val files =
      try s.iterator().asScala.filter(p =>
        p.toString.endsWith(".rs") && Files.isRegularFile(p)).toVector
      finally s.close()
    val (tDefs, tCallsRaw, bad) = RustcGroundTruth.parse(root, files)
    val good = files.filterNot(p =>
      bad.contains(root.relativize(p).toString.replace('\\', '/')))
    val extracted = good.map { p =>
      val rel = root.relativize(p).toString.replace('\\', '/')
      rel -> RustExtractor.extract(SourceFile(rel, p.toString, "rustc",
        p.getFileName.toString, "rs", "rust", Files.readString(p)))
    }
    val tDefSet = tDefs.map(d => (d.file, d.fqn, d.kind)).toSet
    val hDefSet = extracted.flatMap { case (rel, ex) =>
      ex.definitions.map(d => (rel, d.fqn, d.definitionType)) }.toSet
    val stop = RustExtractor.keywords
    val hCalls = extracted.flatMap { case (rel, ex) =>
      ex.references.map(r => (rel, r.name)) }.toSet
      .filterNot(p => stop(p._2))
    val tCalls = tCallsRaw.map(c => (c.file, c.name)).toSet
      .filterNot(p => stop(p._2))

    what match {
      case "defs" =>
        println("== truth defs MISSED by heuristic ==")
        (tDefSet -- hDefSet).toVector.sorted.take(limit).foreach(t =>
          println(s"MISS ${t._3}\t${t._1}\t${t._2}"))
        println("== heuristic defs NOT in truth (false positives) ==")
        (hDefSet -- tDefSet).toVector.sorted.take(limit).foreach(t =>
          println(s"FP   ${t._3}\t${t._1}\t${t._2}"))
      case _ =>
        println("== truth calls MISSED by heuristic ==")
        (tCalls -- hCalls).toVector.sorted.take(limit).foreach(t =>
          println(s"MISS ${t._1}\t${t._2}"))
        println("== heuristic calls NOT in truth ==")
        (hCalls -- tCalls).toVector.sorted.take(limit).foreach(t =>
          println(s"FP   ${t._1}\t${t._2}"))
    }
  }
}
