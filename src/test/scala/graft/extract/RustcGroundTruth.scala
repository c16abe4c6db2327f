package graft.extract

import java.nio.file.{Files, Path}
import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.sys.process._

/** Real-parser ground truth for the Rust extractor-fidelity measurement:
  * nightly rustc's own pre-expansion AST (`-Zunpretty=ast-tree`, a REAL
  * parse by the grammar's defining implementation — parse-only, so files
  * with unresolved `mod child;` / external crates still dump fine, the
  * child mod just shows as `Unloaded`). The Debug dump is strictly
  * 4-space-indented, which makes it line-parseable with an indent stack.
  *
  * Lowered to the heuristic's conventions so set-recall is apples-to-apples
  * (same treatment as [[ScalacGroundTruth]] / [[JavacGroundTruth]] /
  * [[PyAstGroundTruth]]):
  *  - struct/enum → Class; trait → Interface; mod → Module (incl. unloaded
  *    `mod x;` declarations); impl → a Class def for the SELF type's last
  *    path segment (rust.rs:186-210 resolves the receiving type, not the
  *    trait) — non-path self types fall back to the trait path's first
  *    segment, mirroring the heuristic's plain-`impl` regex capture;
  *  - fn → Method when any container encloses it, Function at top level;
  *    fn bodies do NOT extend the FQN chain (a fn-local helper fn or
  *    struct carries the enclosing CONTAINER chain only);
  *  - struct fields (lowercase idents) → Field, enum variants (uppercase
  *    idents) → Variant (rust.rs:288-299); union/variant-payload fields
  *    and tuple-struct positional fields are not definitions;
  *  - const/static/type-alias/macro_rules are not definitions (the
  *    reference's Rust analyzer doesn't emit them either);
  *  - call refs for `name(…)` (ExprKind::Call with a Path callee — last
  *    segment) and `recv.name(…)` (ExprKind::MethodCall), the two shapes
  *    the heuristic emits; macro calls (`format!`) are not refs.
  *
  * Test scope only; shells out to rustc once per file on a small pool.
  */
object RustcGroundTruth {

  final case class TruthDef(file: String, fqn: String, kind: String)
  final case class TruthCall(file: String, name: String)

  private val rustup = "/root/.cargo/bin/rustup"

  def available: Boolean =
    try Process(Seq(rustup, "run", "nightly", "rustc", "--version")).!!(
      ProcessLogger(_ => ())).nonEmpty
    catch { case _: Exception => false }

  /** Dump + lower every file; returns (defs, calls, unparseable-rels). */
  def parse(root: Path, files: Seq[Path])
      : (Vector[TruthDef], Vector[TruthCall], Set[String]) = {
    val pool = Executors.newFixedThreadPool(8)
    try {
      val tasks = files.map { p =>
        new Callable[(String, Option[(Vector[TruthDef], Vector[TruthCall])])] {
          def call() = {
            val rel = root.relativize(p).toString.replace('\\', '/')
            rel -> dump(p).map(lines => lower(rel, lines))
          }
        }
      }
      val done = pool.invokeAll(tasks.asJava).asScala.map(_.get()).toVector
      val bad = done.collect { case (rel, None) => rel }.toSet
      val ok = done.collect { case (_, Some(dc)) => dc }
      (ok.flatMap(_._1), ok.flatMap(_._2), bad)
    } finally { pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES) }
  }

  /** `-Zunpretty=ast-tree` on nightly; 2024 first (10/11 reference crates),
    * 2021 fallback for the straggler. None when neither edition parses.
    */
  private def dump(p: Path): Option[Array[String]] = {
    def run(edition: String): Option[Array[String]] = {
      val out = new java.lang.StringBuilder
      val cmd = Seq(rustup, "run", "nightly", "rustc",
        "-Zunpretty=ast-tree", "--edition", edition, p.toString)
      val rc = Process(cmd).!(ProcessLogger(l => {
        out.append(l); out.append('\n') }, _ => ()))
      if (rc == 0) Some(out.toString.split('\n')) else None
    }
    run("2024").orElse(run("2021"))
  }

  private val kindRe = """^( *)kind: ([A-Za-z]+)\($""".r
  // bare AST ident line, e.g. `Foo#0,` (raw idents dump as `r#type#0`)
  private val bareIdentRe = """^ *(?:r#)?([A-Za-z_]\w*)#\d+,?$""".r
  // named ident field, e.g. `ident: area#0,`
  private val identFieldRe = """^( *)ident: (?:r#)?([A-Za-z_]\w*)#\d+,$""".r

  private def indentOf(s: String): Int = s.indexWhere(_ != ' ') max 0

  /** Lower one file's dump. Exposed for direct unit probing. */
  private[extract] def lower(rel: String, lines: Array[String])
      : (Vector[TruthDef], Vector[TruthCall]) = {
    val defs = Vector.newBuilder[TruthDef]
    val calls = Vector.newBuilder[TruthCall]
    // containers: (indent of the `kind:` line, name, flavor)
    var stack = List.empty[(Int, String, String)]

    def chain: List[String] =
      stack.collect { case (_, n, f) if f != "union" => n }.reverse
    def fqn(name: String): String = (chain :+ name).mkString(".")

    // end (exclusive) of the block opened at line i: first later line at
    // indent <= indent(i). The dump is strictly 4-space nested.
    def blockEnd(i: Int): Int = {
      val ind = indentOf(lines(i))
      var j = i + 1
      while (j < lines.length && indentOf(lines(j)) > ind) j += 1
      j
    }
    def firstIdentIn(from: Int, until: Int): Option[String] = {
      var j = from
      while (j < until) {
        lines(j) match {
          case identFieldRe(_, n) => return Some(n)
          case _ => j += 1
        }
      }
      None
    }
    // first `ident:` at EXACTLY the given indent — skips idents nested in
    // attribute paths (`#[strum(…)]` on a variant) and generic params
    def identAtDepth(from: Int, until: Int, depth: Int): Option[String] = {
      var j = from
      while (j < until) {
        lines(j) match {
          case identFieldRe(ind, n) if ind.length == depth => return Some(n)
          case _ =>
        }
        j += 1
      }
      None
    }
    // last ident at the minimal indent in [from, until): the final
    // top-level path segment (deeper idents are generic args)
    def lastMinIndentIdent(from: Int, until: Int): Option[String] = {
      var best = Int.MaxValue
      var name: Option[String] = None
      var j = from
      while (j < until) {
        lines(j) match {
          case identFieldRe(ind, n) =>
            if (ind.length < best) { best = ind.length; name = Some(n) }
            else if (ind.length == best) name = Some(n)
          case _ =>
        }
        j += 1
      }
      name
    }
    def firstKindIn(from: Int, until: Int): Option[(Int, String)] = {
      var j = from
      while (j < until) {
        lines(j) match {
          case kindRe(_, k) => return Some((j, k))
          case _ => j += 1
        }
      }
      None
    }
    // Impl container name: self_ty's last top-level path segment when the
    // self type is a plain path; else the trait path's FIRST segment (what
    // the heuristic's `impl(?:<…>)?\s+(ident)` regex captures for
    // `impl<'a> Trait for &'a Foo`-shaped headers).
    def implName(implLine: Int, end: Int): Option[String] = {
      var selfTy: Option[Int] = None
      var ofTrait: Option[Int] = None
      var j = implLine + 1
      val base = indentOf(lines(implLine))
      while (j < end && (selfTy.isEmpty || ofTrait.isEmpty)) {
        val t = lines(j)
        // Impl struct fields sit two levels below the `kind: Impl(` line
        if (indentOf(t) <= base + 8) {
          val tr = t.trim
          if (tr.startsWith("self_ty: Ty {")) selfTy = Some(j)
          else if (tr.startsWith("of_trait: Some(")) ofTrait = Some(j)
        }
        j += 1
      }
      val fromSelf = selfTy.flatMap { s =>
        val se = blockEnd(s)
        firstKindIn(s + 1, se).collect {
          case (kj, "Path") => lastMinIndentIdent(kj + 1, blockEnd(kj))
          // `impl dyn Trait {…}`: scope under the first bound's trait name
          // (what the heuristic's `impl (?:dyn )?(ident)` captures)
          case (kj, "TraitObject") => firstIdentIn(kj + 1, blockEnd(kj))
        }.flatten
      }
      fromSelf.orElse(ofTrait.flatMap { s =>
        firstIdentIn(s + 1, blockEnd(s))
      })
    }

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val ind = indentOf(line)
      while (stack.nonEmpty && ind <= stack.head._1) stack = stack.tail

      line match {
        case kindRe(_, k) =>
          k match {
            case "Struct" | "Enum" =>
              // ItemKind carries the ident as the immediate first tuple
              // element; ExprKind::Struct / PatKind::Struct don't
              lines.lift(i + 1).collect { case bareIdentRe(n) => n }.foreach {
                n =>
                  defs += TruthDef(rel, fqn(n), "Class")
                  stack ::= (ind, n, k.toLowerCase)
              }
            case "Union" =>
              lines.lift(i + 1).collect { case bareIdentRe(n) => n }.foreach {
                n => stack ::= (ind, n, "union") // swallow fields, no def
              }
            case "Trait" =>
              identAtDepth(i + 1, blockEnd(i), ind + 8).foreach { n =>
                defs += TruthDef(rel, fqn(n), "Interface")
                stack ::= (ind, n, "trait")
              }
            case "Mod" =>
              // Mod(safety, ident, ModKind) — ident is the 2nd element
              lines.lift(i + 2).collect { case bareIdentRe(n) => n }.foreach {
                n =>
                  defs += TruthDef(rel, fqn(n), "Module")
                  stack ::= (ind, n, "mod")
              }
            case "Fn" =>
              identAtDepth(i + 1, i + 8 min lines.length, ind + 8).foreach {
                n =>
                  val kind = if (chain.nonEmpty) "Method" else "Function"
                  defs += TruthDef(rel, fqn(n), kind)
              }
            case "Impl" =>
              val end = blockEnd(i)
              implName(i, end).foreach { n =>
                defs += TruthDef(rel, fqn(n), "Class")
                stack ::= (ind, n, "impl")
              }
            case "MethodCall" =>
              // MethodCallExpr { seg: PathSegment { ident: … } } — the
              // segment leads, so the first ident is the method name
              firstIdentIn(i + 1, i + 6).foreach { n =>
                calls += TruthCall(rel, n)
              }
            case "Call" =>
              // callee is the first child Expr; a ref only when its kind
              // is Path (`name(…)` / `Type::assoc(…)`)
              val end = blockEnd(i)
              if (i + 1 < end && lines(i + 1).trim.startsWith("Expr {")) {
                val calleeEnd = blockEnd(i + 1)
                firstKindIn(i + 2, calleeEnd).foreach { case (kj, kk) =>
                  if (kk == "Path")
                    lastMinIndentIdent(kj + 1, blockEnd(kj)).foreach { n =>
                      calls += TruthCall(rel, n)
                    }
                }
              }
            case _ =>
          }
        case _ =>
          // struct fields / enum variants at the direct body of the
          // nearest container, mirroring BraceExtractor.memberRule
          val t = line.trim
          if (t == "FieldDef {" && stack.headOption.exists(_._3 == "struct")) {
            val end = blockEnd(i)
            var j = i + 1
            var found = false
            while (j < end && !found) {
              if (lines(j).trim == "ident: Some(") {
                lines.lift(j + 1).collect { case bareIdentRe(n) => n }
                  .filter(n => n.head.isLower || n.head == '_')
                  .foreach { n => defs += TruthDef(rel, fqn(n), "Field") }
                found = true
              }
              j += 1
            }
          } else if (t == "Variant {" &&
              stack.headOption.exists(_._3 == "enum")) {
            identAtDepth(i + 1, blockEnd(i), ind + 4)
              .filter(_.head.isUpper)
              .foreach { n => defs += TruthDef(rel, fqn(n), "Variant") }
          }
      }
      i += 1
    }
    (defs.result(), calls.result())
  }
}
