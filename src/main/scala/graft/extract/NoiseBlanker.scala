package graft.extract

/** Length-preserving "noise" blanking shared by the line-scanning
  * extractors: string-literal contents, char literals, block comments and
  * multi-line string bodies become spaces so code-shaped text inside
  * literals cannot fabricate definitions/call sites and quoted braces
  * cannot corrupt scope depth. Columns stay aligned because every blanked
  * character is replaced, never removed. `//`-style line comments are left
  * in place for each extractor's existing truncation (safe once string
  * contents are gone — a `//` inside a URL literal no longer truncates).
  *
  * Import/require lines that carry quoted module paths (TypeScript, Ruby)
  * should MATCH on the blanked line (so commented-out imports are ignored)
  * and recover the path text from the identical character span of the raw
  * line — blanking is length-preserving, so spans line up.
  *
  * String-interpolation holes (`${…}` in Scala/Kotlin templates and JS
  * backticks, `#{…}` in Ruby) are CODE, not string text — scalac and
  * tree-sitter both parse them as expressions, so `s"…${esc(p)}…"` carries
  * a real call site. When a [[Holes]] config is passed, a hole that CLOSES
  * ON THE SAME LINE is left unblanked (scanned as code, including nested
  * string literals inside it); an unclosed opener stays string text, so a
  * stray `${` in a multi-line literal can never leak the rest of the file
  * into code mode. The opener and closer stay visible and brace-balanced,
  * so extractor scope depth is unaffected.
  */
private[extract] object NoiseBlanker {

  /** Where interpolation holes are recognized.
    *
    * @param open           hole opener ("${" or "#{"); closer is `}`
    * @param inQuote        holes occur in single-line `"…"` strings
    *                       (Scala s-strings, Kotlin, Ruby)
    * @param inMulti        holes occur in the multi-line string form
    *                       (Scala triple-quote, Kotlin, JS backtick)
    * @param prefixRequired the string must be prefixed by an identifier to
    *                       interpolate (Scala `s"…"`/`f"…"`; Kotlin and JS
    *                       templates always interpolate)
    */
  final case class Holes(open: String, inQuote: Boolean, inMulti: Boolean,
                         prefixRequired: Boolean)

  // scanning modes
  private final val Code = 0
  private final val DQ = 1 // single-line "…"
  private final val SQ = 2 // single-line '…' (single-quote-string languages)
  private final val Multi = 3 // multi-line string body
  private final val Block = 4 // block comment body
  private final val Raw = 5 // Rust raw string body (r"…", r#"…"#, br##"…"##)

  /** @param lineComment        comment marker to stop scanning at ("//", "#")
    * @param multilineDelim     multi-line string delimiter (Scala/Kotlin
    *                           `"""`, TypeScript backtick) — body may span lines
    * @param singleQuoteStrings `'...'` is a full string (TS/Ruby) rather
    *                           than a char literal (JVM/Rust, lookahead-guarded
    *                           so Rust lifetimes `&'a` pass through)
    * @param blockComments      blank C-style block-comment spans
    * @param holes              interpolation-hole config, if the language has one
    * @param rawStrings         recognize Rust raw strings `r"…"` /
    *                           `r#"…"#` / `br##"…"##` — the body (which may
    *                           span lines and contain unescaped quotes and
    *                           braces) is blanked until `"` + the opener's
    *                           hash count
    * @param regexLiterals      recognize JS `/…/flags` regex literals —
    *                           their bodies carry unbalanced quotes
    *                           (`/^".*"$/`) and braces (`/^ {2}/`) that
    *                           desync quote tracking and scope depth. A `/`
    *                           is a regex opener only in expression
    *                           position (after `( , = : [ ! & | ? ; { }`
    *                           operators or a `return`-family keyword) and
    *                           only when it closes on the same line (JS
    *                           regex literals cannot span lines); otherwise
    *                           it is division and passes through
    */
  def blank(raw: Array[String], lineComment: String,
            multilineDelim: Option[String],
            singleQuoteStrings: Boolean = false,
            blockComments: Boolean = true,
            holes: Option[Holes] = None,
            rawStrings: Boolean = false,
            regexLiterals: Boolean = false): Array[String] = {
    val out = new Array[String](raw.length)
    // file-level carry-over: only Block, Multi and Raw span lines
    var carry = Code
    var multiInterp = false
    var rawHashes = 0 // '#' count of the open raw string's delimiter
    // JS template literals process \` escapes (Scala/Kotlin triple-quotes
    // treat backslash literally) — without this, an escaped backtick inside
    // a template closes it early and desyncs the rest of the file
    val multiEscapes = multilineDelim.contains("`")

    def isIdentChar(c: Char) =
      Character.isLetterOrDigit(c) || c == '_' || c == '$'

    // operators/punctuation after which a `/` is a regex, not division
    // ('<' is handled separately below — JSX closing tags)
    val regexPrecede = "(,=:[!&|?;{}+-*%>~^"
    // keywords after which a `/` is a regex (`return /x/.test(s)`)
    val regexKeywords = Set("return", "case", "typeof", "instanceof", "in",
      "of", "new", "delete", "void", "do", "else", "yield", "await")
    // is position j (a '/') in expression position on (blanked-so-far) b?
    def regexPosition(b: Array[Char], j: Int): Boolean = {
      var k = j - 1
      while (k >= 0 && b(k) == ' ') k -= 1
      if (k < 0) return true // line start
      if (b(k) == '<') {
        // JSX/TSX closing tag (`</td>`, fragment `</>`): a '/' right after
        // '<' opens markup, not a regex — blanking up to the next '/' would
        // swallow real code between two tags. Only if what follows the '/'
        // could not start a tag name (`x < /\d/.test(s)`) is it a regex.
        val n = if (j + 1 < b.length) b(j + 1) else ' '
        return !(isIdentChar(n) || n == '>')
      }
      if (regexPrecede.indexOf(b(k)) >= 0) return true
      if (!isIdentChar(b(k))) return false
      val end = k
      while (k >= 0 && isIdentChar(b(k))) k -= 1
      regexKeywords(new String(b, k + 1, end - k))
    }
    // index of the closing unescaped '/' (char-class aware), or -1
    def regexClose(b: Array[Char], j: Int): Int = {
      var k = j + 1
      var inClass = false
      while (k < b.length) {
        val c = b(k)
        if (c == '\\') k += 2
        else if (c == '[') { inClass = true; k += 1 }
        else if (c == ']') { inClass = false; k += 1 }
        else if (c == '/' && !inClass) return k
        else k += 1
      }
      -1
    }

    // index just past the matching `}` of a hole opened at `j`, or -1 when
    // the hole does not close on this line. Brace-counted; nested string
    // literals inside the hole are not modeled here — this is only the
    // same-line guard, the real scan handles them.
    def closesOnLine(s: String, j: Int, open: String): Boolean = {
      var k = j + open.length
      var depth = 0
      while (k < s.length) {
        val c = s.charAt(k)
        if (c == '{') depth += 1
        else if (c == '}') {
          if (depth == 0) return true
          depth -= 1
        }
        k += 1
      }
      false
    }

    for (i <- raw.indices) {
      val s = raw(i)
      val b = s.toCharArray
      var j = 0
      var done = false
      var mode = carry
      var dqInterp = false
      // string modes suspended by an open hole (same-line by the guard):
      // (mode to resume, that mode's interp flag); depth counts nested
      // braces inside the current hole
      var holeStack = List.empty[(Int, Boolean)]
      var holeDepth = 0

      def holeOpens(interpOk: Boolean): Boolean = holes match {
        case Some(h) if interpOk && s.startsWith(h.open, j) &&
            closesOnLine(s, j, h.open) => true
        case _ => false
      }
      def openHole(resumeMode: Int, resumeInterp: Boolean): Unit = {
        holeStack ::= (resumeMode, resumeInterp)
        holeDepth = 0
        mode = Code
        j += holes.get.open.length // opener stays visible (balanced by its })
      }

      while (j < b.length && !done) {
        mode match {
          case Raw =>
            // closes at `"` followed by exactly the opener's hash count
            if (b(j) == '"' && j + rawHashes < b.length &&
                (0 until rawHashes).forall(k => b(j + 1 + k) == '#')) {
              mode = Code; j += 1 + rawHashes
            } else if (b(j) == '"' && rawHashes > 0 &&
                j + rawHashes >= b.length) { b(j) = ' '; j += 1 }
            else if (b(j) == '"' && rawHashes == 0) { mode = Code; j += 1 }
            else { b(j) = ' '; j += 1 }
          case Block =>
            if (s.startsWith("*/", j)) {
              b(j) = ' '; b(j + 1) = ' '; mode = Code; j += 2
            } else { b(j) = ' '; j += 1 }
          case Multi =>
            if (multiEscapes && b(j) == '\\' && j + 1 < b.length) {
              b(j) = ' '; b(j + 1) = ' '; j += 2
            } else if (s.startsWith(multilineDelim.get, j)) {
              mode = Code; j += multilineDelim.get.length
            } else if (holeOpens(holes.exists(h => h.inMulti &&
                (multiInterp || !h.prefixRequired)))) {
              openHole(Multi, multiInterp)
            } else { b(j) = ' '; j += 1 }
          case DQ =>
            if (b(j) == '\\' && j + 1 < b.length) {
              b(j) = ' '; b(j + 1) = ' '; j += 2
            } else if (b(j) == '"') { mode = Code; j += 1 }
            else if (holeOpens(holes.exists(_.inQuote) && dqInterp)) {
              openHole(DQ, dqInterp)
            } else { b(j) = ' '; j += 1 }
          case SQ =>
            if (b(j) == '\\' && j + 1 < b.length) {
              b(j) = ' '; b(j + 1) = ' '; j += 2
            } else if (b(j) == '\'') { mode = Code; j += 1 }
            else { b(j) = ' '; j += 1 }
          case _ => // Code, possibly inside a hole
            if (holeStack.nonEmpty && b(j) == '{') { holeDepth += 1; j += 1 }
            else if (holeStack.nonEmpty && b(j) == '}') {
              if (holeDepth == 0) {
                val (rm, ri) = holeStack.head
                holeStack = holeStack.tail
                mode = rm
                if (rm == DQ) dqInterp = ri
                if (rm == Multi) multiInterp = ri
                j += 1 // the } stays visible (balances the opener's {)
              } else { holeDepth -= 1; j += 1 }
            } else if (multilineDelim.isDefined &&
                s.startsWith(multilineDelim.get, j)) {
              multiInterp = j > 0 && isIdentChar(b(j - 1))
              mode = Multi; j += multilineDelim.get.length
            } else if (rawStrings && (b(j) == 'r' || b(j) == 'b') &&
                (j == 0 || !isIdentChar(b(j - 1))) && {
                  var k = j + (if (b(j) == 'b' && j + 1 < b.length &&
                    b(j + 1) == 'r') 2 else if (b(j) == 'r') 1 else b.length)
                  val h0 = k
                  while (k < b.length && b(k) == '#') k += 1
                  if (k < b.length && b(k) == '"') {
                    rawHashes = k - h0; mode = Raw; j = k + 1; true
                  } else false
                }) {
              // handled in the guard: r/br + #* + " opened a raw string
            } else if (b(j) == '"') {
              dqInterp = !holes.exists(_.prefixRequired) ||
                (j > 0 && isIdentChar(b(j - 1)))
              mode = DQ; j += 1
            } else if (singleQuoteStrings && b(j) == '\'') {
              mode = SQ; j += 1
            } else if (!singleQuoteStrings && b(j) == '\'' && j + 2 < b.length &&
                (b(j + 2) == '\'' ||
                  (b(j + 1) == '\\' && j + 3 < b.length && b(j + 3) == '\''))) {
              // 'x' / '\x' only — lookahead-guarded so Rust lifetimes (&'a)
              // and Scala symbols pass through untouched
              if (b(j + 1) == '\\') { b(j + 1) = ' '; b(j + 2) = ' '; j += 4 }
              else { b(j + 1) = ' '; j += 3 }
            } else if (blockComments && s.startsWith("/*", j)) {
              b(j) = ' '; b(j + 1) = ' '; mode = Block; j += 2
            } else if (s.startsWith(lineComment, j)) {
              done = true // caller truncates from here
            } else if (regexLiterals && b(j) == '/' && regexPosition(b, j) && {
                val close = regexClose(b, j)
                if (close < 0) false
                else {
                  // blank the body; keep both delimiters; skip flags
                  var k = j + 1
                  while (k < close) { b(k) = ' '; k += 1 }
                  k = close + 1
                  while (k < b.length && Character.isLetter(b(k))) k += 1
                  j = k; true
                }
              }) {
              // handled in the guard: /…/flags body blanked
            } else j += 1
        }
      }
      // only Block and Multi survive a line break: an unterminated "…" /
      // '…' is a syntax error the next line shouldn't inherit, and holes
      // are same-line by the guard (an open hole at EOL means its string
      // resumed — restore the suspended mode if it was multi-line)
      carry = mode match {
        case Block => Block
        case Multi => Multi
        case Raw => Raw
        case Code if holeStack.exists(_._1 == Multi) => Multi
        case _ => Code
      }
      out(i) = new String(b)
    }
    out
  }
}
