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
  */
private[extract] object NoiseBlanker {

  /** @param lineComment        comment marker to stop scanning at ("//", "#")
    * @param multilineDelim     multi-line string delimiter (Scala/Kotlin
    *                           `"""`, TypeScript backtick) — body may span lines
    * @param singleQuoteStrings `'...'` is a full string (TS/Ruby) rather
    *                           than a char literal (JVM/Rust, lookahead-guarded
    *                           so Rust lifetimes `&'a` pass through)
    * @param blockComments      blank C-style block-comment spans
    */
  def blank(raw: Array[String], lineComment: String,
            multilineDelim: Option[String],
            singleQuoteStrings: Boolean = false,
            blockComments: Boolean = true): Array[String] = {
    val out = new Array[String](raw.length)
    var inBlock = false
    var inMulti = false
    for (i <- raw.indices) {
      val s = raw(i)
      val b = s.toCharArray
      var j = 0
      var done = false
      while (j < b.length && !done) {
        if (inBlock) {
          if (s.startsWith("*/", j)) { b(j) = ' '; b(j + 1) = ' '; inBlock = false; j += 2 }
          else { b(j) = ' '; j += 1 }
        } else if (inMulti) {
          if (s.startsWith(multilineDelim.get, j)) {
            inMulti = false; j += multilineDelim.get.length
          } else { b(j) = ' '; j += 1 }
        } else if (multilineDelim.isDefined && s.startsWith(multilineDelim.get, j)) {
          inMulti = true; j += multilineDelim.get.length
        } else if (b(j) == '"') {
          j += 1
          var closed = false
          while (j < b.length && !closed) {
            if (b(j) == '\\' && j + 1 < b.length) { b(j) = ' '; b(j + 1) = ' '; j += 2 }
            else if (b(j) == '"') { closed = true; j += 1 }
            else { b(j) = ' '; j += 1 }
          }
        } else if (singleQuoteStrings && b(j) == '\'') {
          j += 1
          var closed = false
          while (j < b.length && !closed) {
            if (b(j) == '\\' && j + 1 < b.length) { b(j) = ' '; b(j + 1) = ' '; j += 2 }
            else if (b(j) == '\'') { closed = true; j += 1 }
            else { b(j) = ' '; j += 1 }
          }
        } else if (!singleQuoteStrings && b(j) == '\'' && j + 2 < b.length &&
            (b(j + 2) == '\'' ||
              (b(j + 1) == '\\' && j + 3 < b.length && b(j + 3) == '\''))) {
          // 'x' / '\x' only — lookahead-guarded so Rust lifetimes (&'a) and
          // Scala symbols pass through untouched
          if (b(j + 1) == '\\') { b(j + 1) = ' '; b(j + 2) = ' '; j += 4 }
          else { b(j + 1) = ' '; j += 3 }
        } else if (blockComments && s.startsWith("/*", j)) {
          b(j) = ' '; b(j + 1) = ' '; inBlock = true; j += 2
        } else if (s.startsWith(lineComment, j)) {
          done = true // caller truncates from here
        } else j += 1
      }
      out(i) = new String(b)
    }
    out
  }
}
