package graft.extract

import java.nio.file.{Files, Paths}

/** Scratch single-file extractor debug: prints defs + refs the heuristic
  * sees for one file. Test scope; not part of the suite.
  */
object MiniDiag {
  def main(args: Array[String]): Unit = {
    val p = Paths.get(args.headOption.getOrElse(
      "src/main/scala/graft/serve/WorkspaceManager.scala"))
    val sf = SourceFile(p.toString, p.toString, "diag",
      p.getFileName.toString, "scala", "scala", Files.readString(p))
    val ex = ScalaExtractor.extract(sf)
    val grep = args.lift(1).getOrElse("")
    ex.definitions.filter(d => grep.isEmpty || d.fqn.contains(grep))
      .foreach(d => println(
        s"DEF ${d.fqn} [${d.startLine}-${d.endLine}] kind=${d.definitionType}"))
    ex.references.filter(r => grep.isEmpty || r.name.contains(grep))
      .foreach(r => println(s"REF ${r.name} line=${r.startLine} recv='${r.receiver}'"))
  }
}
