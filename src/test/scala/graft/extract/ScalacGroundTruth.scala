package graft.extract

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.collection.mutable.ArrayBuffer
import scala.tools.nsc.{Global, Settings}
import scala.tools.nsc.reporters.StoreReporter
import graft.analyze.Indexer.FileMeta

/** Real-parser ground truth for the extractor-fidelity measurement
  * (round-3 verdict item 8): the Scala compiler's own parser (scala-compiler
  * is on the unmanaged Spark classpath) turns real Scala sources into full
  * syntax trees, and this helper lowers them to the engine's pre-parsed
  * tables for `Indexer.fromParsed` — the same contract a tree-sitter fleet
  * would use. Test scope only: the library never depends on the compiler.
  *
  * Lowering conventions match the heuristic ScalaExtractor so set-recall is
  * apples-to-apples: FQNs are unqualified container chains (the Scala
  * extractor does not package-qualify), objects/case classes → Class,
  * traits → Interface, defs → Method (Function when top-level), primary
  * constructors and synthetic members skipped. Call refs are emitted for
  * `name(...)` / `recv.name(...)` / `new X(...)` shapes with
  * identifier-chain receivers — the same families the heuristic emits.
  */
object ScalacGroundTruth {

  def parseDir(dir: Path): (Seq[FileMeta], Seq[RawDefinition], Seq[RawImport],
      Seq[RawReference]) = {
    val scalaFiles = {
      val s = Files.walk(dir)
      try s.iterator().asScala.filter(p =>
        p.toString.endsWith(".scala") && Files.isRegularFile(p)).toVector
      finally s.close()
    }
    val settings = new Settings
    settings.usejavacp.value = true
    settings.Yrangepos.value = true
    val reporter = new StoreReporter(settings)
    val g = new Global(settings, reporter)
    new g.Run() // the parser consults currentRun (Scala-3 syntax gating)

    val metas = ArrayBuffer[FileMeta]()
    val defs = ArrayBuffer[RawDefinition]()
    val imps = ArrayBuffer[RawImport]()
    val refs = ArrayBuffer[RawReference]()
    val identChain = """[A-Za-z_][\w.]*""".r

    scalaFiles.foreach { abs =>
      val rel = dir.relativize(abs).toString.replace('\\', '/')
      val name = abs.getFileName.toString
      metas += FileMeta(rel, abs.toString, "scalac-truth", name, "scala", "scala")
      val code = Files.readString(abs)
      val unit = new g.CompilationUnit(g.newSourceFile(code, rel))
      val tree = g.newUnitParser(unit).parse()

      def posOf(t: g.Tree): (Long, Long, Int, Int, Int, Int) =
        if (t.pos.isDefined && t.pos.isRange)
          (t.pos.start.toLong, t.pos.end.toLong, t.pos.source.offsetToLine(t.pos.start),
            t.pos.source.offsetToLine(t.pos.end), 0, 0)
        else if (t.pos.isDefined)
          (t.pos.point.toLong, t.pos.point.toLong,
            t.pos.source.offsetToLine(t.pos.point),
            t.pos.source.offsetToLine(t.pos.point), 0, 0)
        else (0L, 0L, 0, 0, 0, 0)

      val traverser = new g.Traverser {
        private var containers = List.empty[String]
        private def fqnOf(n: String) = (containers.reverse :+ n).mkString(".")

        private def emitDef(t: g.Tree, n: String, kind: String): Unit = {
          val (sb, eb, sl, el, sc, ec) = posOf(t)
          defs += RawDefinition(rel, fqnOf(n), n, kind, sb, eb, sl, el, sc, ec)
        }
        private def emitRef(t: g.Tree, n: String, recv: String): Unit =
          if (identChain.matches(n)) {
            val (sb, eb, sl, _, sc, ec) = posOf(t)
            refs += RawReference(rel, n, "", sb, eb, sl, sc, ec, recv)
          }
        private def recvOf(qual: g.Tree): String = {
          val s = qual.toString
          if (identChain.matches(s)) s else ""
        }

        // anonymous classes (`new T { … }` parses as a ClassDef named
        // "$anon") are not definitions under either extractor's convention:
        // skip the def AND the container push, so members inside keep the
        // enclosing named-container chain — the heuristic's convention
        private def named(n: String): Boolean =
          identChain.matches(n) && !n.startsWith("$")

        override def traverse(t: g.Tree): Unit = t match {
          case md: g.ModuleDef if named(md.name.decoded) =>
            emitDef(md, md.name.decoded, "Class")
            containers ::= md.name.decoded
            super.traverse(t)
            containers = containers.tail
          case cd: g.ClassDef if named(cd.name.decoded) =>
            emitDef(cd, cd.name.decoded,
              if (cd.mods.isTrait) "Interface" else "Class")
            containers ::= cd.name.decoded
            super.traverse(t)
            containers = containers.tail
          case (_: g.ModuleDef) | (_: g.ClassDef) => super.traverse(t)
          case dd: g.DefDef =>
            val n = dd.name.decoded
            if (n != "<init>" && !dd.mods.isSynthetic &&
                identChain.matches(n) && !n.contains("."))
              emitDef(dd, n,
                if (containers.isEmpty) "Function" else "Method")
            super.traverse(t)
          case imp: g.Import =>
            val base = imp.expr.toString
            if (identChain.matches(base)) {
              imp.selectors.foreach { sel =>
                val selName = sel.name.decoded
                if (selName == "_")
                  imps += RawImport(rel, "wildcard_import", base, "*", null,
                    0, 0, 0, 0, 0, 0)
                else
                  imps += RawImport(rel, "import", s"$base.$selName", selName,
                    if (sel.rename != null && sel.rename.decoded != selName)
                      sel.rename.decoded
                    else null, 0, 0, 0, 0, 0, 0)
              }
            }
            super.traverse(t)
          case g.Apply(g.Select(g.New(tpt), _), args) =>
            val simple = tpt.toString.takeWhile(c => c != '[').split("\\.").last
            if (identChain.matches(simple)) emitRef(t, simple, "")
            args.foreach(traverse)
          case g.Apply(sel @ g.Select(qual, nm), args) if nm.isTermName =>
            emitRef(sel, nm.decoded, recvOf(qual))
            traverse(qual); args.foreach(traverse)
          case g.Apply(id @ g.Ident(nm), args) if nm.isTermName =>
            emitRef(id, nm.decoded, "")
            args.foreach(traverse)
          case _ => super.traverse(t)
        }
      }
      traverser.traverse(tree)
    }
    (metas.toSeq, defs.toSeq, imps.toSeq, refs.toSeq)
  }
}
