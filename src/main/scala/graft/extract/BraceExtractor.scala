package graft.extract

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Shared brace-depth extractor core for the C-family languages the
  * reference supports (Java, Kotlin, C#, Rust — parsing/processor.rs:183-196
  * lists the full language set). Per-language regex tables; scope nesting by
  * brace depth, like [[TypeScriptExtractor]].
  */
abstract class BraceExtractor extends Extractor {

  /** (regex, kind) for container definitions that open a named scope. */
  protected def containerRes: Seq[(Regex, String)]
  /** (regex, kind) for callable definitions. */
  protected def callableRes: Seq[(Regex, String)]
  /** import/include statements → (importType, importPath, name, alias). */
  protected def parseImport(line: String): Option[(String, String, String, String)]
  protected def keywords: Set[String]
  protected def lineComment: String = "//"

  private val callRe: Regex =
    """(?:([A-Za-z_$][A-Za-z0-9_$.]*)\.)?([A-Za-z_$][A-Za-z0-9_$]*)\s*\(""".r

  override def extract(f: SourceFile): Extracted = {
    val lines = f.content.split("\n", -1)
    val lineStart = new Array[Long](lines.length + 1)
    var off = 0L
    for (i <- lines.indices) { lineStart(i) = off; off += lines(i).getBytes("UTF-8").length + 1 }
    lineStart(lines.length) = off

    val defs = ArrayBuffer[RawDefinition]()
    val imports = ArrayBuffer[RawImport]()
    val refs = ArrayBuffer[RawReference]()
    // (depthAtOpen, name, index into defs — for end-range backfill at pop)
    var containerStack = List.empty[(Int, String, Int)]
    // callables with a brace-opened body: (depthAtOpen, defIdx) — tracked
    // only for end-range backfill (they never contribute to FQNs), so the
    // resolver's innermost-caller window attributes call sites to the
    // METHOD, not just its enclosing class
    var callableStack = List.empty[(Int, Int)]
    var depth = 0

    for (i <- lines.indices) {
      val raw = lines(i)
      val line = raw.indexOf(lineComment) match {
        case -1 => raw
        case n => raw.substring(0, n)
      }
      def fqnOf(name: String) =
        (containerStack.reverseIterator.map(_._2).toSeq :+ name).mkString(".")
      def add(name: String, kind: String, colNo: Int): Unit =
        defs += RawDefinition(f.path, fqnOf(name), name, kind,
          lineStart(i) + colNo, lineStart(i) + line.length, i, i, colNo, line.length)

      var matched = false
      var refScanFrom = 0 // after a def header, only scan the remainder
      containerRes.foreach { case (re, kind) =>
        if (!matched) re.findFirstMatchIn(line).foreach { m =>
          add(m.group(1), kind, m.start(1))
          containerStack ::= (depth, m.group(1), defs.length - 1)
          matched = true
          refScanFrom = m.end
        }
      }
      if (!matched) callableRes.foreach { case (re, kind) =>
        if (!matched) re.findFirstMatchIn(line).foreach { m =>
          val name = m.group(1)
          if (!keywords(name)) {
            val k = if (kind == "Method" && containerStack.isEmpty) "Function" else kind
            add(name, k, m.start(1))
            if (line.indexOf('{', m.end - 1) >= 0)
              callableStack ::= (depth, defs.length - 1)
            matched = true
            refScanFrom = m.end
          }
        }
      }
      if (!matched) parseImport(line).foreach { case (it, path, name, alias) =>
        imports += RawImport(f.path, it, path, name, alias,
          lineStart(i), lineStart(i) + line.length, i, i, 0, line.length)
        refScanFrom = line.length
      }
      if (refScanFrom < line.length)
        callRe.findAllMatchIn(line.substring(refScanFrom)).foreach { m =>
          val name = m.group(2)
          val c0 = refScanFrom + m.start(2)
          val c1 = refScanFrom + m.end(2)
          // call-form (parens): empty receiver → CALLS classification
          if (!keywords(name))
            refs += RawReference(f.path, name, "",
              lineStart(i) + c0, lineStart(i) + c1, i, c0, c1)
        }

      for (c <- line) {
        if (c == '{') depth += 1
        else if (c == '}') {
          depth -= 1
          while (containerStack.nonEmpty && depth <= containerStack.head._1) {
            // backfill the container's true extent (block end, not header) —
            // the reference resolver's caller-containment join needs it
            val idx = containerStack.head._3
            defs(idx) = defs(idx).copy(
              endByte = lineStart(i) + line.length, endLine = i)
            containerStack = containerStack.tail
          }
          while (callableStack.nonEmpty && depth <= callableStack.head._1) {
            val idx = callableStack.head._2
            defs(idx) = defs(idx).copy(
              endByte = lineStart(i) + line.length, endLine = i)
            callableStack = callableStack.tail
          }
        }
      }
    }
    Extracted(f, defs.toSeq, imports.toSeq, refs.toSeq)
  }
}

/** Java (reference fixtures: fixtures/java, analyzer
  * analysis/languages/java/expression_resolver.rs).
  */
object JavaExtractor extends BraceExtractor {
  override val language = "java"
  override val containerRes = Seq(
    """(?:public\s+|private\s+|protected\s+|abstract\s+|final\s+|static\s+)*class\s+([A-Za-z_$][A-Za-z0-9_$]*)""".r -> "Class",
    """(?:public\s+|private\s+|protected\s+)*interface\s+([A-Za-z_$][A-Za-z0-9_$]*)""".r -> "Interface",
    """(?:public\s+|private\s+|protected\s+)*enum\s+([A-Za-z_$][A-Za-z0-9_$]*)""".r -> "Class",
    """(?:public\s+|private\s+|protected\s+)*record\s+([A-Za-z_$][A-Za-z0-9_$]*)""".r -> "Class")
  override val callableRes = Seq(
    """(?:public\s+|private\s+|protected\s+|static\s+|final\s+|synchronized\s+|abstract\s+|native\s+)+[A-Za-z_$][\w$<>\[\],. ]*\s+([A-Za-z_$][A-Za-z0-9_$]*)\s*\([^;]*\)\s*(?:throws[\w, .]+)?\{""".r -> "Method")
  override val keywords = Set("if", "for", "while", "switch", "catch", "return",
    "new", "super", "this", "assert", "synchronized")
  override def parseImport(line: String) = {
    val re = """^\s*import\s+(static\s+)?([\w.]+)(\.\*)?\s*;""".r
    re.findFirstMatchIn(line).map { m =>
      val path = m.group(2)
      val wildcard = m.group(3) != null
      (if (m.group(1) != null) "static_import" else if (wildcard) "wildcard_import" else "import",
        path, if (wildcard) "*" else path.split("\\.").last, null)
    }
  }
}

/** Kotlin (reference fixtures: fixtures/kotlin, resolver
  * analysis/languages/kotlin/expression_resolver.rs).
  */
object KotlinExtractor extends BraceExtractor {
  override val language = "kotlin"
  override val containerRes = Seq(
    """(?:data\s+|sealed\s+|abstract\s+|open\s+|inner\s+|enum\s+|annotation\s+)*class\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class",
    """(?:sealed\s+)?interface\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Interface",
    """(?:companion\s+)?object\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class")
  override val callableRes = Seq(
    """(?:override\s+|open\s+|private\s+|public\s+|internal\s+|protected\s+|inline\s+|suspend\s+|operator\s+|infix\s+|tailrec\s+)*fun\s+(?:<[^>]+>\s*)?(?:[\w.<>?]+\.)?([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r -> "Method",
    """val\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*\{""".r -> "Lambda")
  override val keywords = Set("if", "for", "while", "when", "catch", "return",
    "listOf", "mapOf", "setOf")
  override def parseImport(line: String) = {
    val re = """^\s*import\s+(\w+(?:\.\w+)*)(\.\*)?(?:\s+as\s+(\w+))?""".r
    re.findFirstMatchIn(line).map { m =>
      val wildcard = m.group(2) != null
      (if (wildcard) "wildcard_import" else "import", m.group(1),
        if (wildcard) "*" else m.group(1).split("\\.").last, m.group(3))
    }
  }
}

/** C# (reference language set includes CSharp). */
object CSharpExtractor extends BraceExtractor {
  override val language = "csharp"
  override val containerRes = Seq(
    """(?:public\s+|private\s+|internal\s+|protected\s+|abstract\s+|sealed\s+|static\s+|partial\s+)*class\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class",
    """(?:public\s+|internal\s+)*interface\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Interface",
    """(?:public\s+|internal\s+)*struct\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class",
    """namespace\s+([A-Za-z_][A-Za-z0-9_.]*)""".r -> "Module")
  override val callableRes = Seq(
    """(?:public\s+|private\s+|internal\s+|protected\s+|static\s+|virtual\s+|override\s+|async\s+|sealed\s+)+[A-Za-z_][\w<>\[\],. ?]*\s+([A-Za-z_][A-Za-z0-9_]*)\s*\([^;]*\)\s*\{?""".r -> "Method")
  override val keywords = Set("if", "for", "while", "switch", "catch", "return",
    "new", "base", "this", "using", "foreach", "lock")
  override def parseImport(line: String) = {
    val re = """^\s*using\s+(static\s+)?([\w.]+)\s*;""".r
    re.findFirstMatchIn(line).map { m =>
      (if (m.group(1) != null) "static_import" else "import", m.group(2),
        m.group(2).split("\\.").last, null)
    }
  }
}

/** Scala — beyond the reference's language set, so this engine can index
  * itself (and any Spark codebase).
  */
object ScalaExtractor extends BraceExtractor {
  override val language = "scala"
  override val containerRes = Seq(
    """(?:final\s+|abstract\s+|sealed\s+|case\s+|private\s+|implicit\s+)*class\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class",
    """(?:case\s+)?object\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class",
    """(?:sealed\s+)?trait\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Interface")
  override val callableRes = Seq(
    """(?:override\s+|private(?:\[\w+\])?\s+|protected\s+|final\s+|implicit\s+|lazy\s+)*def\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Method")
  override val keywords = Set("if", "for", "while", "match", "return", "Seq",
    "Map", "Set", "List", "Array", "Some", "println", "assert", "require")
  override def parseImport(line: String) = {
    val re = """^\s*import\s+(\w+(?:\.\w+)*)(?:\.(_|\{[^}]*\}|\w+))?\s*$""".r
    re.findFirstMatchIn(line.takeWhile(_ != '/')).flatMap { m =>
      val base = m.group(1)
      Option(m.group(2)) match {
        case Some("_") => Some(("wildcard_import", base, "*", null))
        case Some(sel) if sel.startsWith("{") =>
          Some(("named_import", base, sel.stripPrefix("{").stripSuffix("}")
            .split(",")(0).trim.split("\\s*=>\\s*")(0), null))
        case Some(one) => Some(("import", s"$base.$one", one, null))
        case None => Some(("import", base, base.split("\\.").last, null))
      }
    }
  }
}

/** Rust (reference language set includes Rust). */
object RustExtractor extends BraceExtractor {
  override val language = "rust"
  override val containerRes = Seq(
    """(?:pub(?:\([^)]*\))?\s+)?mod\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Module",
    """(?:pub(?:\([^)]*\))?\s+)?struct\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class",
    """(?:pub(?:\([^)]*\))?\s+)?enum\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class",
    """(?:pub(?:\([^)]*\))?\s+)?trait\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Interface",
    """impl(?:\s*<[^>]*>)?\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Class")
  override val callableRes = Seq(
    """(?:pub(?:\([^)]*\))?\s+)?(?:async\s+|unsafe\s+|const\s+|extern\s+)*fn\s+([A-Za-z_][A-Za-z0-9_]*)""".r -> "Method")
  override val keywords = Set("if", "for", "while", "match", "return", "Some",
    "Ok", "Err", "None", "vec", "println", "panic", "assert", "assert_eq")
  override def parseImport(line: String) = {
    val re = """^\s*(?:pub\s+)?use\s+([\w:]+)(?:::\{[^}]*\})?(?:\s+as\s+(\w+))?\s*;""".r
    re.findFirstMatchIn(line).map { m =>
      ("use", m.group(1).replace("::", "."),
        m.group(1).split("::").last, m.group(2))
    }
  }
}
