package graft.extract

import java.nio.file.{Files, Paths}

/** Scratch single-file extractor debug: prints defs + refs the heuristic
  * sees for one file. Test scope; not part of the suite.
  */
object MiniDiag {
  def main(args: Array[String]): Unit = {
    val p = Paths.get(args.headOption.getOrElse(
      "src/main/scala/graft/serve/WorkspaceManager.scala"))
    val name = p.getFileName.toString
    val extn = name.substring(name.lastIndexOf('.') + 1)
    val (lang, extractor: Extractor) = extn match {
      case "rs" => ("rust", RustExtractor)
      case "java" => ("java", JavaExtractor)
      case "kt" => ("kotlin", KotlinExtractor)
      case "cs" => ("csharp", CSharpExtractor)
      case "rb" => ("ruby", RubyExtractor)
      case "py" => ("python", PythonExtractor)
      case "ts" | "tsx" | "js" | "jsx" => ("typescript", TypeScriptExtractor)
      case _ => ("scala", ScalaExtractor)
    }
    val sf = SourceFile(p.toString, p.toString, "diag", name, extn, lang,
      Files.readString(p))
    val ex = extractor.extract(sf)
    val grep = args.lift(1).getOrElse("")
    ex.definitions.filter(d => grep.isEmpty || d.fqn.contains(grep))
      .foreach(d => println(
        s"DEF ${d.fqn} [${d.startLine}-${d.endLine}] kind=${d.definitionType}"))
    ex.references.filter(r => grep.isEmpty || r.name.contains(grep))
      .foreach(r => println(s"REF ${r.name} line=${r.startLine} recv='${r.receiver}'"))
  }
}
