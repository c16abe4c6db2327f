package graft.extract

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative check of the scope machinery the round-4 extractor rework
  * introduced: random definition trees rendered with RANDOM formatting —
  * same-line braces, multiline parameter lists, next-line extends clauses,
  * body-less case classes between siblings, expression bodies, interleaved
  * comments and string literals carrying decoy code — must extract EXACTLY
  * the expected FQN set. A phantom scope (body-less header pushed), a lost
  * scope (multiline header never opened), or a literal leak (decoy
  * extracted) each breaks set equality.
  */
class ExtractorPropertySpec extends AnyFunSuite {

  private sealed trait Node { def name: String }
  private case class Container(name: String, kids: List[Node],
      multilineHeader: Boolean, withExtends: Boolean) extends Node
  private case class CaseClassLeaf(name: String) extends Node
  private case class DefBrace(name: String) extends Node
  private case class DefExpr(name: String, multilineSig: Boolean) extends Node

  private def render(n: Node, indent: Int, sb: StringBuilder): Unit = {
    val pad = "  " * indent
    n match {
      case Container(name, kids, ml, ext) =>
        if (ml) {
          sb.append(s"${pad}class $name(\n")
          sb.append(s"$pad    val a: Int,\n")
          sb.append(s"$pad    val b: String)\n")
          if (ext) sb.append(s"$pad  extends Serializable {\n")
          else sb.append(s"$pad{\n")
        } else if (ext)
          sb.append(s"${pad}object $name extends Serializable {\n")
        else sb.append(s"${pad}object $name {\n")
        kids.foreach(render(_, indent + 1, sb))
        sb.append(s"$pad}\n")
      case CaseClassLeaf(name) =>
        sb.append(s"${pad}case class $name(x: Int, y: String)\n")
      case DefBrace(name) =>
        sb.append(s"${pad}def $name(v: Int): Int = {\n")
        sb.append(s"$pad  val r = v + 1 // comment: def decoyA() = 1\n")
        sb.append(s"$pad  r\n")
        sb.append(s"$pad}\n")
      case DefExpr(name, ml) =>
        if (ml) {
          sb.append(s"${pad}def $name(\n")
          sb.append(s"$pad    v: Int,\n")
          sb.append(s"$pad    w: Int): Int =\n")
          sb.append(s"$pad  helperCall(v) +\n")
          sb.append(s"$pad    otherCall(w)\n")
        } else
          sb.append(s"${pad}def $name(v: Int): Int = helperCall(v)\n")
    }
  }

  /** decoy noise: string literals and comments carrying code-shaped text */
  private val noise = Seq(
    """  val s1 = "class Phantom { def ghost() = 1 }"""" + "\n",
    "  /* class Decoy { def hidden(): Int = 2 } */\n",
    "  // def lineDecoy(): Unit = ()\n")

  private def expected(n: Node, chain: List[String]): Set[String] = n match {
    case Container(name, kids, _, _) =>
      val fqn = (chain :+ name).mkString(".")
      kids.flatMap(expected(_, chain :+ name)).toSet + fqn
    case other => Set((chain :+ other.name).mkString("."))
  }

  private def treeGen(names: Iterator[String], depth: Int): Gen[Node] = {
    val leaf: Gen[Node] = Gen.oneOf(
      Gen.const(()).map(_ => CaseClassLeaf(names.next())),
      Gen.const(()).map(_ => DefBrace(names.next())),
      Gen.oneOf(true, false).map(ml => DefExpr(names.next(), ml)))
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      3 -> (for {
        nKids <- Gen.chooseNum(1, 3)
        ml <- Gen.oneOf(true, false)
        ext <- Gen.oneOf(true, false)
        name = names.next()
        kids <- Gen.listOfN(nKids, treeGen(names, depth - 1))
      } yield Container(name, kids, ml, ext)))
  }

  test("property: random trees under random formatting extract exactly the expected FQNs") {
    (0 until 60).foreach { i =>
      val names = Iterator.from(0).map(k => s"N${i}x$k")
      val gen = for {
        nTop <- Gen.chooseNum(1, 4)
        tops <- Gen.listOfN(nTop, treeGen(names, 2))
      } yield tops
      val tops = gen.apply(Gen.Parameters.default, Seed(1234L + i)).get
      val sb = new StringBuilder
      tops.zipWithIndex.foreach { case (t, j) =>
        render(t, 0, sb)
        sb.append(noise(j % noise.length))
      }
      val src = sb.toString
      val e = ScalaExtractor.extract(SourceFile(
        "P.scala", "/P.scala", "r", "P.scala", "scala", "scala", src))
      val got = e.definitions.map(_.fqn).toSet
      val want = tops.flatMap(expected(_, Nil)).toSet
      assert(got == want,
        s"seed ${1234L + i}\n--- missing: ${want.diff(got)}\n--- phantom: ${got.diff(want)}\n$src")
      // decoys from strings/comments must never leak
      assert(!e.definitions.exists(d => d.name.toLowerCase.contains("decoy") ||
        d.name == "Phantom" || d.name == "ghost"), e.definitions.toString)
    }
  }
}
