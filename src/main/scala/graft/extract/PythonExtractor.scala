package graft.extract

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** E2 for Python — heuristic (indentation-aware) extractor.
  *
  * Stands in for the reference's tree-sitter parse
  * (indexer/src/parsing/processor.rs:179-420; richest analyzer is Python —
  * analysis/languages/python/analyzer.rs). Pure function of file content:
  * embarrassingly parallel inside `mapPartitions`. Covers:
  * class / def (Function vs Method by enclosing scope) / `x = lambda`,
  * `import a.b as c` (comma lists), `from a.b import x as y, z`
  * (incl. relative dots), call references `f(...)` and `recv.f(...)`.
  */
object PythonExtractor extends Extractor {

  override val language = "python"

  private val classRe: Regex = """^(\s*)class\s+([A-Za-z_][A-Za-z0-9_]*)""".r
  private val defRe: Regex = """^(\s*)(?:async\s+)?def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  private val lambdaRe: Regex = """^(\s*)([A-Za-z_][A-Za-z0-9_]*)\s*=\s*lambda\b""".r
  private val importRe: Regex = """^\s*import\s+(.+)$""".r
  private val fromRe: Regex = """^\s*from\s+(\.*[A-Za-z0-9_.]*)\s+import\s+(.+)$""".r
  private val callRe: Regex =
    """(?:([A-Za-z_][A-Za-z0-9_.]*)\.)?([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r
  private val keywords = Set("if", "elif", "while", "for", "with", "return",
    "yield", "assert", "def", "class", "lambda", "not", "and", "or", "in",
    "is", "except", "raise", "del", "print")

  private final case class Scope(indent: Int, name: String, kind: String,
      startLine: Int, startByte: Long, startCol: Int, fqn: String) {
    var endLine: Int = -1
    var endByte: Long = -1
  }

  override def extract(f: SourceFile): Extracted = {
    val lines = f.content.split("\n", -1)
    // ref-scan twin of each line: string bodies blanked so call-shaped
    // text inside literals can't fabricate references (and a '#' inside a
    // string no longer truncates the scan) — while f-string holes stay
    // code, which is exactly how CPython's ast sees them (`f"rgb({int(x)})"`
    // carries a real int() call; the rgb( text does not). The ident-prefix
    // rule scopes hole parsing to f/rb-prefixed strings.
    val refLines = NoiseBlanker.blank(lines, "#", Some("\"\"\""),
      singleQuoteStrings = true, blockComments = false,
      holes = Some(NoiseBlanker.Holes("{", inQuote = true, inMulti = true,
        prefixRequired = true)))
    // byte offset of each line start (UTF-8)
    val lineStart = new Array[Long](lines.length + 1)
    var off = 0L
    for (i <- lines.indices) {
      lineStart(i) = off
      off += lines(i).getBytes("UTF-8").length + 1
    }
    lineStart(lines.length) = off
    val totalBytes = math.max(0L, off - 1)

    val defs = ArrayBuffer[RawDefinition]()
    val imports = ArrayBuffer[RawImport]()
    val refs = ArrayBuffer[RawReference]()
    var stack = List.empty[Scope]

    def close(s: Scope, lastLine: Int): Unit = {
      val end = math.max(s.startLine, lastLine)
      defs += RawDefinition(f.path, s.fqn, s.name, s.kind,
        lineStart(s.startLine) + s.startCol,
        math.min(lineStart(math.min(end + 1, lines.length)) - 1, totalBytes),
        s.startLine, end, s.startCol, 0)
    }

    var lastContent = 0 // last non-blank, non-comment line index
    var tq: String = null // active triple-quote (docstring) delimiter
    for (i <- lines.indices) {
      val line = lines(i)
      val trimmed = line.trim
      val wasInDocstring = tq != null
      tq = advanceTripleQuote(line, tq)
      // docstring body lines are neither defs nor refs, and must not close
      // indentation scopes
      val isBlank = trimmed.isEmpty || trimmed.startsWith("#") || wasInDocstring
      if (!isBlank) {
        val indent = line.indexWhere(c => c != ' ' && c != '\t') match {
          case -1 => 0
          case n => n
        }
        // close scopes this line dedents out of (continuation closers like
        // ')' at indent 0 don't end a scope)
        if (!isContinuation(trimmed)) {
          while (stack.nonEmpty && indent <= stack.head.indent) {
            close(stack.head, lastContent)
            stack = stack.tail
          }
        }
        definesScope(line) match {
          case Some((ind, name, kindRaw)) =>
            val kind = kindRaw match {
              case "def" =>
                if (stack.headOption.exists(_.kind == "Class")) "Method" else "Function"
              case "class" => "Class"
              case other => other
            }
            val fqn = (stack.reverseIterator.map(_.name).toSeq :+ name).mkString(".")
            val sc = Scope(ind, name, kind, i, lineStart(i), ind, fqn)
            if (kind == "Lambda") {
              sc.endLine = i
              close(sc, i)
            } else stack ::= sc
          case None =>
            extractImports(f, line, i, lineStart, imports)
            extractRefs(f, refLines(i), i, lineStart, refs)
        }
        lastContent = i
      }
    }
    stack.foreach(close(_, lastContent))
    Extracted(f, defs.toSeq, imports.toSeq, refs.toSeq)
  }

  /** Track '''/\"\"\" string state across lines (both delimiters, same-line
    * open+close pairs handled).
    */
  private def advanceTripleQuote(line: String, state: String): String = {
    var s = state
    var i = 0
    while (i <= line.length - 3) {
      val three = line.substring(i, i + 3)
      if (s == null && (three == "\"\"\"" || three == "'''")) { s = three; i += 3 }
      else if (s != null && three == s) { s = null; i += 3 }
      else i += 1
    }
    s
  }

  private def isContinuation(trimmed: String): Boolean =
    trimmed.startsWith(")") || trimmed.startsWith("]") || trimmed.startsWith("}")

  private def definesScope(line: String): Option[(Int, String, String)] =
    classRe.findFirstMatchIn(line).map(m => (m.group(1).length, m.group(2), "class"))
      .orElse(defRe.findFirstMatchIn(line).map(m => (m.group(1).length, m.group(2), "def")))
      .orElse(lambdaRe.findFirstMatchIn(line).map(m => (m.group(1).length, m.group(2), "Lambda")))

  private def extractImports(f: SourceFile, line: String, i: Int,
      lineStart: Array[Long], out: ArrayBuffer[RawImport]): Unit = {
    def byteAt(c: Int) = lineStart(i) + c
    line match {
      case importRe(rest) if !line.trim.startsWith("from") =>
        rest.split(",").map(_.trim).filter(_.nonEmpty).foreach { item =>
          val parts = item.split("\\s+as\\s+")
          val path = parts(0).trim
          val alias = if (parts.length > 1) parts(1).trim else null
          val name = path.split("\\.").last
          out += RawImport(f.path, "import", path, name, alias,
            byteAt(line.indexOf("import")), byteAt(line.length), i, i, 0, line.length)
        }
      case fromRe(module, names) =>
        names.split(",").map(_.trim).filter(_.nonEmpty).foreach { item =>
          val cleaned = item.stripPrefix("(").stripSuffix(")").trim
          if (cleaned.nonEmpty && cleaned != "*") {
            val parts = cleaned.split("\\s+as\\s+")
            val name = parts(0).trim
            val alias = if (parts.length > 1) parts(1).trim else null
            out += RawImport(f.path, "from_import", module, name, alias,
              byteAt(0), byteAt(line.length), i, i, 0, line.length)
          } else if (cleaned == "*") {
            out += RawImport(f.path, "wildcard_import", module, "*", null,
              byteAt(0), byteAt(line.length), i, i, 0, line.length)
          }
        }
      case _ =>
    }
  }

  private def extractRefs(f: SourceFile, line: String, i: Int,
      lineStart: Array[Long], out: ArrayBuffer[RawReference]): Unit = {
    val code = line.indexOf('#') match {
      case -1 => line
      case n => line.substring(0, n)
    }
    if (code.trim.startsWith("import ") || code.trim.startsWith("from ")) return
    callRe.findAllMatchIn(code).foreach { m =>
      val name = m.group(2)
      if (!keywords(name)) {
        // call-form reference (parens): receiver stays empty so resolution
        // classifies it CALLS/AMBIGUOUSLY_CALLS — the reference reserves
        // PROPERTY_REFERENCE for non-call attribute access
        // (database/src/graph/relationship.rs:99-105)
        out += RawReference(f.path, name, "",
          lineStart(i) + m.start(2), lineStart(i) + m.end(2),
          i, m.start(2), m.end(2))
      }
    }
  }
}

trait Extractor extends Serializable {
  def language: String
  def extract(f: SourceFile): Extracted
}

object Extractors {
  val all: Seq[Extractor] = Seq(PythonExtractor, TypeScriptExtractor,
    RubyExtractor, JavaExtractor, KotlinExtractor, CSharpExtractor,
    RustExtractor, ScalaExtractor)
  val byLanguage: Map[String, Extractor] =
    all.map(e => e.language -> e).toMap + ("javascript" -> TypeScriptExtractor)
  def extract(f: SourceFile): Extracted =
    byLanguage.get(f.language).map(_.extract(f))
      .getOrElse(Extracted(f, Nil, Nil, Nil))
}
