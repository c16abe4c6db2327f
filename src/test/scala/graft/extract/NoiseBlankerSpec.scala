package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The blanking state machine in isolation — especially the
  * interpolation-hole rules added for call-site fidelity (holes are code to
  * a real parser; see ExtractorFidelitySpec). Every case asserts
  * length-preservation too: extractors rely on raw/blanked spans lining up.
  */
class NoiseBlankerSpec extends AnyFunSuite {

  private val scalaHoles = Some(NoiseBlanker.Holes(
    "${", inQuote = true, inMulti = true, prefixRequired = true))
  private val kotlinHoles = Some(NoiseBlanker.Holes(
    "${", inQuote = true, inMulti = true, prefixRequired = false))
  private val rubyHoles = Some(NoiseBlanker.Holes(
    "#{", inQuote = true, inMulti = false, prefixRequired = false))

  private def scalaBlank(lines: String*): Array[String] =
    NoiseBlanker.blank(lines.toArray, "//", Some("\"\"\""), holes = scalaHoles)

  private def assertLen(in: Seq[String], out: Array[String]): Unit =
    in.zip(out).foreach { case (a, b) =>
      assert(a.length == b.length, s"length changed: '$a' -> '$b'")
    }

  test("interpolated hole survives blanking; surrounding string text dies") {
    val in = Seq("""val x = s"prefix ${esc(p)} suffix"""")
    val out = scalaBlank(in: _*)
    assertLen(in, out)
    assert(out(0).contains("${esc(p)}"))
    assert(!out(0).contains("prefix"))
    assert(!out(0).contains("suffix"))
  }

  test("plain (uninterpolated) Scala string keeps ${...} as dead text") {
    val out = scalaBlank("""val x = "prefix ${esc(p)} suffix"""")
    assert(!out(0).contains("esc"))
  }

  test("kotlin: every string interpolates, no prefix needed") {
    val out = NoiseBlanker.blank(
      Array("""val x = "count: ${list.size(n)}""""), "//", Some("\"\"\""),
      holes = kotlinHoles)
    assert(out(0).contains("${list.size(n)}"))
  }

  test("unclosed hole opener stays string text (no leak into code mode)") {
    val in = Seq("""val x = s"broken ${never closes""", """val y = f(z)""")
    val out = scalaBlank(in: _*)
    assertLen(in, out)
    assert(!out(0).contains("never"))
    // next line is unaffected code
    assert(out(1) == """val y = f(z)""")
  }

  test("nested string literal inside a hole is itself blanked") {
    val in = Seq("""val x = s"${m.getOrElse(k, "quoted}brace")} tail"""")
    val out = scalaBlank(in: _*)
    assertLen(in, out)
    assert(out(0).contains("m.getOrElse(k,"))
    assert(!out(0).contains("quoted"))
    assert(!out(0).contains("tail"))
  }

  test("nested braces inside a hole keep the hole open to its real close") {
    val in = Seq("""val x = s"${xs.map { x => f(x) }.sum} out"""")
    val out = scalaBlank(in: _*)
    assert(out(0).contains("xs.map { x => f(x) }.sum"))
    assert(!out(0).contains("out"))
  }

  test("holes in triple-quoted interpolated strings work across body lines") {
    val tq = "\"\"\""
    val in = Seq(
      s"""  val j = s$tq{"a":"$${esc(p)}",""",
      s"""    "b":"$${q(v)}"}$tq""")
    val out = scalaBlank(in: _*)
    assertLen(in, out)
    assert(out(0).contains("${esc(p)}"))
    assert(out(1).contains("${q(v)}"))
    assert(!out(0).contains("\"a\":"))
  }

  test("plain triple-quoted string keeps ${...} dead (prefix required)") {
    val in = Seq("val x = \"\"\"text ${f(a)} more\"\"\"")
    val out = scalaBlank(in: _*)
    assert(!out(0).contains("f(a)"))
  }

  test("ruby: #{...} interpolates in double quotes, not single quotes") {
    val out = NoiseBlanker.blank(
      Array("""msg = "hello #{user.name(x)}"""",
        """raw = 'hello #{user.name(x)}'"""),
      "#", None, singleQuoteStrings = true, blockComments = false,
      holes = rubyHoles)
    assert(out(0).contains("#{user.name(x)}"))
    assert(!out(1).contains("user"))
  }

  test("js template holes interpolate in backticks only") {
    val holes = Some(NoiseBlanker.Holes(
      "${", inQuote = false, inMulti = true, prefixRequired = false))
    val out = NoiseBlanker.blank(
      Array("const a = `count ${fn(x)}`;",
        """const b = "count ${fn(x)}";"""),
      "//", Some("`"), singleQuoteStrings = true, holes = holes)
    assert(out(0).contains("${fn(x)}"))
    assert(!out(1).contains("fn(x)"))
  }

  test("pre-hole behavior unchanged: strings, chars, comments blank; " +
      "lifetimes survive") {
    val in = Seq(
      """let s = "class Fake { def x }"; // trailing""",
      """let c = 'x'; let lt: &'a str = v;""",
      """/* class Commented { */ real(code)""")
    val out = NoiseBlanker.blank(in.toArray, "//", None)
    assertLen(in, out)
    assert(!out(0).contains("class Fake"))
    assert(out(0).contains("// trailing")) // line comments left for caller
    assert(!out(1).contains("'x'") && out(1).contains("&'a"))
    assert(!out(2).contains("Commented") && out(2).contains("real(code)"))
  }

  test("randomized round-trip: blanking is always length-preserving and " +
      "idempotent on its own output's code spans") {
    val rng = new scala.util.Random(42)
    val atoms = Seq("s\"a ${f(x)} b\"", "\"plain ${g(y)}\"", "ident",
      "call(a, b)", "// cmt", "'c'", "s\"${m(\"q\")}\"", "{", "}", "(", ")",
      "\"unterminated", "s\"${open", "\"\"\"", "new X[T]")
    (0 until 200).foreach { _ =>
      val lines = Array.fill(rng.nextInt(5) + 1)(
        Seq.fill(rng.nextInt(6))(atoms(rng.nextInt(atoms.size)))
          .mkString(" "))
      val out = NoiseBlanker.blank(lines, "//", Some("\"\"\""),
        holes = scalaHoles)
      lines.zip(out).foreach { case (a, b) =>
        assert(a.length == b.length,
          s"length changed for input:\n${lines.mkString("\n")}")
      }
    }
  }
  test("JS regex literals: expression-position bodies blanked, division kept") {
    val js = Seq(
      """const SUBKEY = /^ {2}[^\s]+:$/""",          // braces in body
      """if (/^".*"$/.test(chunk)) {""",              // quote in body
      """const r = a / b / c""",                      // division: untouched
      """return /x\/y/.test(s)""",                   // escaped slash in body
      """metadata[1] = metadata[1].replace(/#.*/, '')""",
      """const half = (a + 1) / 2""")                 // after ): division
    val out = NoiseBlanker.blank(js.toArray, "//", Some("`"),
      singleQuoteStrings = true, regexLiterals = true)
    assert(!out(0).contains("{2}"), out(0))           // braces gone
    assert(out(0).count(_ == '/') == 2)               // delimiters stay
    assert(!out(1).contains("\""), out(1))            // stray quote gone
    assert(out(1).contains(".test(chunk)"))
    assert(out(2) == js(2))                           // division untouched
    assert(!out(3).contains("x"), out(3))
    assert(out(3).contains(".test(s)"))
    assert(!out(4).contains("#.*"), out(4))
    assert(out(5) == js(5))
    // depth/quote tracking stays sane on the NEXT line after each
    val follow = NoiseBlanker.blank(Array(
      """const q = /^"$/""", """real(code) // visible"""),
      "//", Some("`"), singleQuoteStrings = true, regexLiterals = true)
    assert(follow(1).contains("real(code)"))
  }

  test("JS template literals: escaped backticks do not close the template") {
    val js = Seq(
      "const t = `;; run \\` + \\`npm help\\` for docs",
      "still inside ${f(x)} the template",
      "`",
      "after(close)")
    val out = NoiseBlanker.blank(js.toArray, "//", Some("`"),
      singleQuoteStrings = true,
      holes = Some(NoiseBlanker.Holes("${", inQuote = false, inMulti = true,
        prefixRequired = false)), regexLiterals = true)
    assert(!out(0).contains("npm help"))              // body blanked
    assert(!out(1).contains("still inside"))          // template continued
    assert(out(1).contains("f(x)"))                   // hole stays code
    assert(out(3).contains("after(close)"))           // closed by line 3
  }

}
