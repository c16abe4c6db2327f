package graft.extract

import java.nio.file.Path
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._
import com.sun.source.tree.{ClassTree, CompilationUnitTree, MethodTree, Tree}
import com.sun.source.util.{JavacTask, TreeScanner}

/** Real-parser ground truth for the JAVA extractor-fidelity measurement
  * (round-5: extend the scalac methodology to a JVM language with a real
  * compiler frontend): the JDK's own javac parse API (`javax.tools` +
  * `com.sun.source`, public exported API of jdk.compiler) turns real Java
  * sources into syntax trees; this lowers the type/method declarations to
  * the same FQN conventions the heuristic [[JavaExtractor]] emits, so
  * set-recall is apples-to-apples. Test scope only.
  *
  * Conventions: FQN = package + enclosing TYPE chain + name (method level
  * never contributes to FQNs — local classes attach to their enclosing
  * type, matching the heuristic's container stack); interface +
  * annotation-type → Interface, class/enum/record → Class; methods and
  * constructors → Method (constructors under the class's simple name);
  * anonymous classes are skipped with their whole subtree (the heuristic
  * attributes their members to the enclosing named scope — that divergence
  * is exactly what the fidelity number should surface, on the truth side
  * they simply do not exist as named definitions).
  */
object JavacGroundTruth {

  final case class TruthDef(fqn: String, kind: String)

  def parse(files: Seq[Path]): Seq[TruthDef] = {
    val compiler = javax.tools.ToolProvider.getSystemJavaCompiler
    require(compiler != null, "system javac not available")
    val fm = compiler.getStandardFileManager(null, null,
      java.nio.charset.StandardCharsets.UTF_8)
    try {
      val units = fm.getJavaFileObjectsFromFiles(files.map(_.toFile).asJava)
      val task = compiler.getTask(
        java.io.Writer.nullWriter(), fm,
        (_: javax.tools.Diagnostic[_ <: javax.tools.JavaFileObject]) => (),
        java.util.List.of("-proc:none"), null, units)
        .asInstanceOf[JavacTask]
      val out = ArrayBuffer[TruthDef]()
      task.parse().forEach { cu => scanUnit(cu, out) }
      out.toSeq
    } finally fm.close()
  }

  private def scanUnit(cu: CompilationUnitTree,
      out: ArrayBuffer[TruthDef]): Unit = {
    val pkg = Option(cu.getPackageName).map(_.toString).getOrElse("")
    def fqnOf(chain: List[String], n: String): String =
      ((if (pkg.isEmpty) Nil else List(pkg)) ++ chain.reverse ++ List(n))
        .mkString(".")

    // explicit chain state: TreeScanner's visit order is exactly the
    // lexical nesting, so a stack mirrors the heuristic's container stack
    val scanner: TreeScanner[Void, List[String]] =
      new TreeScanner[Void, List[String]] {
        override def visitClass(t: ClassTree, chain: List[String]): Void = {
          val name = t.getSimpleName.toString
          if (name.isEmpty) return null // anonymous: skip whole subtree
          val kind = t.getKind match {
            case Tree.Kind.INTERFACE | Tree.Kind.ANNOTATION_TYPE => "Interface"
            case _ => "Class"
          }
          out += TruthDef(fqnOf(chain, name), kind)
          super.visitClass(t, name :: chain)
          null
        }
        override def visitMethod(t: MethodTree, chain: List[String]): Void = {
          val mn = t.getName.toString
          if (mn != "<clinit>" && chain.nonEmpty) {
            val dn = if (mn == "<init>") chain.head else mn
            out += TruthDef(fqnOf(chain, dn), "Method")
          }
          // descend WITHOUT adding the method to the chain: local classes
          // inside the body attach to the enclosing type, as the heuristic's
          // container stack does
          super.visitMethod(t, chain)
          null
        }
      }
    scanner.scan(cu, Nil)
  }
}
