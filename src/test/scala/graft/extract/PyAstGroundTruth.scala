package graft.extract

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.sys.process._

/** Real-parser ground truth for the Python extractor-fidelity measurement:
  * CPython's own `ast` module (a REAL parse — the grammar the language is
  * defined by) lowered to the heuristic's conventions so set-recall is
  * apples-to-apples, exactly like [[ScalacGroundTruth]] (scalac) and
  * [[JavacGroundTruth]] (javac parse API):
  *
  *  - FQNs are container chains of class/def names (the chain the
  *    reference's Python analyzer builds too); `if`/`try`/`with` blocks are
  *    not containers;
  *  - def → Method when the IMMEDIATE container is a class, else Function;
  *    `name = lambda …` → Lambda;
  *  - call refs for the `name(…)` / `recv.attr(…)` families (ast Call with
  *    Name/Attribute func), the same two shapes the heuristic emits.
  *
  * Test scope only; shells out to python3 once for the whole corpus.
  */
object PyAstGroundTruth {

  final case class TruthDef(file: String, fqn: String, kind: String)
  final case class TruthCall(file: String, name: String)

  private val script = """
import ast, os, sys
root = sys.argv[1]
out = []
for rel in sys.stdin.read().split('\n'):
    if not rel:
        continue
    try:
        src = open(os.path.join(root, rel), encoding='utf-8').read()
        tree = ast.parse(src)
    except (SyntaxError, UnicodeDecodeError):
        out.append('E\t' + rel)
        continue
    def walk(node, chain, parent_kind):
        for ch in ast.iter_child_nodes(node):
            if isinstance(ch, ast.ClassDef):
                fqn = '.'.join(chain + [ch.name])
                out.append('D\t%s\t%s\tClass' % (rel, fqn))
                walk(ch, chain + [ch.name], 'Class')
            elif isinstance(ch, (ast.FunctionDef, ast.AsyncFunctionDef)):
                kind = 'Method' if parent_kind == 'Class' else 'Function'
                fqn = '.'.join(chain + [ch.name])
                out.append('D\t%s\t%s\t%s' % (rel, fqn, kind))
                walk(ch, chain + [ch.name], 'Function')
            else:
                if isinstance(ch, ast.Assign) and len(ch.targets) == 1 \
                        and isinstance(ch.targets[0], ast.Name) \
                        and isinstance(ch.value, ast.Lambda):
                    fqn = '.'.join(chain + [ch.targets[0].id])
                    out.append('D\t%s\t%s\tLambda' % (rel, fqn))
                if isinstance(ch, ast.Call):
                    f = ch.func
                    if isinstance(f, ast.Name):
                        out.append('C\t%s\t%s' % (rel, f.id))
                    elif isinstance(f, ast.Attribute):
                        out.append('C\t%s\t%s' % (rel, f.attr))
                walk(ch, chain, parent_kind)
    walk(tree, [], '')
sys.stdout.write('\n'.join(out))
"""

  /** Parse `files` (relative to `root`) → (defs, distinct calls, bad files). */
  def parse(root: Path, files: Seq[Path])
      : (Seq[TruthDef], Set[TruthCall], Seq[String]) = {
    val scriptFile = Files.createTempFile("pyast", ".py")
    Files.writeString(scriptFile, script)
    val rels = files.map(p => root.relativize(p).toString.replace('\\', '/'))
    val in = new java.io.ByteArrayInputStream(
      rels.mkString("\n").getBytes("UTF-8"))
    val outBuf = new StringBuilder
    val code = (Seq("python3", scriptFile.toString, root.toString) #< in)
      .!(ProcessLogger(l => { outBuf.append(l).append('\n'); () }, _ => ()))
    require(code == 0, s"python3 ground-truth run failed rc=$code")
    val lines = outBuf.toString.split("\n").filter(_.nonEmpty).toSeq
    val defs = lines.collect { case l if l.startsWith("D\t") =>
      val Array(_, f, fqn, k) = l.split("\t", 4); TruthDef(f, fqn, k) }
    val calls = lines.collect { case l if l.startsWith("C\t") =>
      val Array(_, f, n) = l.split("\t", 3); TruthCall(f, n) }.toSet
    val bad = lines.collect { case l if l.startsWith("E\t") => l.drop(2) }
    (defs, calls, bad)
  }
}
