package graft.extract

import scala.util.matching.Regex

/** Gitignore pattern semantics (reference: the indexer's git-backed
  * FileSource honors nested ignores — indexer/src/indexer.rs:58-72,
  * project/source.rs; `respect_gitignore` in IndexingConfig):
  *
  *  - one `.gitignore` per directory, scoped to its subtree; patterns are
  *    relative to that directory
  *  - LAST matching pattern wins; `!pattern` negates
  *  - a pattern containing a `/` (leading or interior) anchors to the
  *    `.gitignore`'s directory; a bare name matches at any depth
  *  - trailing `/` restricts the pattern to directories (their contents are
  *    excluded by not descending — which also implements git's "cannot
  *    re-include inside an excluded directory" rule)
  *  - `*` matches within a path segment, `?` one non-`/` char, `**` crosses
  *    segments (`a/**` trailing, `**/b` leading, `a/**/b` interior)
  */
object GitIgnore {

  final case class Rule(regex: Regex, negated: Boolean, dirOnly: Boolean)

  /** Rules of one .gitignore file, in declaration order. */
  def parse(lines: Seq[String]): Seq[Rule] =
    lines.map(_.replaceAll("\\s+$", "")).filter(l =>
      l.nonEmpty && !l.startsWith("#")).map { raw =>
      val negated = raw.startsWith("!")
      val p0 = if (negated) raw.substring(1) else raw
      val dirOnly = p0.endsWith("/")
      val p1 = if (dirOnly) p0.dropRight(1) else p0
      val anchored = p1.startsWith("/") || p1.dropRight(1).contains("/")
      val p2 = if (p1.startsWith("/")) p1.substring(1) else p1
      val core = translate(p2)
      val full = if (anchored) core else s"(?:[^/]+/)*$core"
      Rule(("^" + full + "$").r, negated, dirOnly)
    }

  /** One glob segment-path → regex source. */
  private def translate(pat: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pat.length) {
      pat(i) match {
        case '*' if i + 1 < pat.length && pat(i + 1) == '*' =>
          // `**/`, `/**` (consumed with surrounding slashes), bare `**`
          if (i + 2 < pat.length && pat(i + 2) == '/') { sb ++= "(?:[^/]+/)*"; i += 3 }
          else if (i + 2 == pat.length) { sb ++= ".*"; i += 2 }
          else { sb ++= ".*"; i += 2 }
        case '*' => sb ++= "[^/]*"; i += 1
        case '?' => sb ++= "[^/]"; i += 1
        case '[' =>
          val j = pat.indexOf(']', i + 1)
          if (j < 0) { sb ++= "\\["; i += 1 }
          else {
            // glob class → regex class: both `[!...]` and `[^...]` negate
            // (git's wildmatch accepts either), and regex metacharacters
            // inside the class are escaped so a literal `\` or `[` in the
            // class can't change the pattern
            val body0 = pat.substring(i + 1, j)
            val (neg, body) =
              if (body0.startsWith("!") || body0.startsWith("^"))
                (true, body0.substring(1))
              else (false, body0)
            val escaped = body.flatMap {
              case c @ ('\\' | '[' | ']' | '^') => s"\\$c"
              case c => c.toString
            }
            sb ++= (if (neg) s"[^$escaped]" else s"[$escaped]")
            i = j + 1
          }
        case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb += '\\' += c; i += 1
        case c => sb += c; i += 1
      }
    }
    sb.toString
  }

  /** Is `relPath` (relative to the scope stack's outermost dir, `/`
    * separators, no leading slash) ignored? `scopes` = (dir prefix of the
    * .gitignore relative to the same root, its rules), outermost first.
    */
  def ignored(relPath: String, isDir: Boolean,
              scopes: Seq[(String, Seq[Rule])]): Boolean = {
    var result = false
    scopes.foreach { case (prefix, rules) =>
      val local =
        if (prefix.isEmpty) Some(relPath)
        else if (relPath.startsWith(prefix + "/")) Some(relPath.substring(prefix.length + 1))
        else None
      local.foreach { lp =>
        rules.foreach { r =>
          if ((isDir || !r.dirOnly) && r.regex.matches(lp))
            result = !r.negated
        }
      }
    }
    result
  }
}
