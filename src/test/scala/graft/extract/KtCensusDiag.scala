package graft.extract

/** Diagnostic dump (not a test): prints the Kotlin extractor's definitions
  * for every reference Kotlin fixture, for building the hand-annotated
  * census. Run with `sbt "Test/runMain graft.extract.KtCensusDiag"`.
  */
object KtCensusDiag {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Paths.get("/root/reference/fixtures/kotlin")
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(root)
    try {
      for (p <- s.iterator().asScala.toSeq.sortBy(_.toString)
           if p.toString.endsWith(".kt")) {
        val rel = root.relativize(p).toString
        val content = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val f = SourceFile(rel, p.toString, "kfix",
          p.getFileName.toString, "kt", "kotlin", content)
        val ex = Extractors.extract(f)
        println(s"=== $rel")
        ex.definitions.foreach(d => println(s"  DEF ${d.definitionType}\t${d.fqn}"))
        ex.imports.foreach(i => println(s"  IMP ${i.importType}\t${i.importPath}\t${i.name}"))
      }
    } finally s.close()
  }
}
