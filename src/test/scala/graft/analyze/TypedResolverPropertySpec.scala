package graft.analyze

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for TypedResolver's supertype machinery
  * (superClosure / resolveSuper / resolveHeadType): the cycle guard and the
  * self-reference skip were previously justified by one javac example; here
  * random hierarchies — including cycles, diamonds, and nested-name
  * shadowing — pin the termination and precedence claims.
  */
class TypedResolverPropertySpec extends AnyFunSuite {
  import TypedResolver.{DefIn, FactIn, ImpIn, buildCatalog}

  /** Sample `gen` across `n` deterministic seeds (scalatestplus is not in
    * the offline cache; this is the repo's established sampling pattern).
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      check(gen.apply(Gen.Parameters.default, Seed(9876L + i)).get)
    }

  // ---- generators -------------------------------------------------------

  private val simpleNames =
    Vector("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta", "Eta",
      "Theta", "Iota", "Kappa")
  private val pkgs = Vector("com.a", "com.b", "")

  /** A random catalog: top-level types across packages, each with up to two
    * nested types, and random `extends` facts whose raw names are drawn
    * from simple names, dotted nested paths, the subject itself, and
    * garbage — the adversarial space resolveSuper must survive.
    */
  private case class World(defs: Seq[DefIn], facts: Seq[FactIn],
      imps: Seq[ImpIn]) {
    lazy val catalog = buildCatalog(defs, facts, imps)
    lazy val typeFqns: Seq[String] =
      defs.filter(d => Set("Class", "Interface")(d.defType)).map(_.fqn)
  }

  private val genWorld: Gen[World] = for {
    nTop <- Gen.choose(2, 6)
    topNames <- Gen.pick(nTop, simpleNames)
    pkgOf <- Gen.sequence[Seq[Int], Int](
      topNames.toSeq.map(_ => Gen.choose(0, pkgs.size - 1)))
    nestedCounts <- Gen.sequence[Seq[Int], Int](
      topNames.toSeq.map(_ => Gen.choose(0, 2)))
    rawSuperPick <- Gen.choose(0, 1000)
  } yield {
    var id = 0L
    def nextId() = { id += 1; id }
    val defs = scala.collection.mutable.ArrayBuffer[DefIn]()
    val facts = scala.collection.mutable.ArrayBuffer[FactIn]()
    val tops = topNames.toSeq.zipWithIndex.map { case (n, i) =>
      val pkg = pkgs(pkgOf(i))
      val file = s"f$i.java"
      if (pkg.nonEmpty) facts += FactIn(file, "package", "", "", pkg)
      val fqn = if (pkg.isEmpty) n else s"$pkg.$n"
      defs += DefIn(nextId(), fqn, n, "Class", file)
      // nested members reuse OTHER top-level simple names: maximal
      // shadowing pressure (a raw super "Beta" may name a top-level type
      // or someone's nested member)
      val nested = (0 until nestedCounts(i)).map { k =>
        val nn = simpleNames((i + k + 1) % simpleNames.size)
        val nfqn = s"$fqn.$nn"
        defs += DefIn(nextId(), nfqn, nn, "Class", file)
        nfqn
      }
      (fqn, file, nested)
    }
    // random extends facts: ~2 per type, raw names from the adversarial pool
    val rnd = new scala.util.Random(rawSuperPick)
    tops.foreach { case (fqn, file, nested) =>
      val pool = simpleNames ++
        tops.map(_._1) ++ // full fqns as dotted paths
        nested ++
        Seq(fqn.split("\\.").last, // self simple name
          "NoSuchType", s"$fqn.${simpleNames(rnd.nextInt(simpleNames.size))}")
      (0 until 1 + rnd.nextInt(2)).foreach { _ =>
        facts += FactIn(file, "extends", "", fqn,
          pool(rnd.nextInt(pool.size)))
      }
      nested.foreach { nfqn =>
        facts += FactIn(file, "extends", "", nfqn,
          pool(rnd.nextInt(pool.size)))
      }
    }
    World(defs.toSeq, facts.toSeq, Nil)
  }

  // ---- properties -------------------------------------------------------

  test("property: superClosure terminates, contains self, and is step-closed " +
    "on random adversarial hierarchies") {
    forAllSeeded(genWorld, 200) { w =>
      val cat = w.catalog
      w.typeFqns.foreach { fqn =>
        val closure = cat.superClosure(fqn) // non-termination would hang here
        assert(closure.contains(fqn))
        // step-closed: every member's resolved supers are inside the closure
        closure.foreach { t =>
          cat.types.get(t).foreach { ti =>
            ti.supers.flatMap(cat.resolveSuper(ti, _)).foreach { sup =>
              assert(closure.contains(sup),
                s"closure($fqn) missing $sup reached from $t")
            }
          }
        }
        // deterministic
        assert(cat.superClosure(fqn) === closure)
      }
    }
  }

  test("property: resolveSuper never yields the subject or its own nested member") {
    forAllSeeded(genWorld, 200) { w =>
      val cat = w.catalog
      cat.types.values.foreach { ti =>
        ti.supers.foreach { raw =>
          cat.resolveSuper(ti, raw).foreach { r =>
            assert(r != ti.fqn, s"${ti.fqn} resolved super $raw to itself")
            assert(!r.startsWith(ti.fqn + "."),
              s"${ti.fqn} resolved super $raw to own nested member $r")
          }
        }
      }
    }
  }

  test("explicit cycle: A extends B extends A terminates with closure {A, B}") {
    val defs = Seq(
      DefIn(1, "p.A", "A", "Class", "a.java"),
      DefIn(2, "p.B", "B", "Class", "b.java"))
    val facts = Seq(
      FactIn("a.java", "package", "", "", "p"),
      FactIn("b.java", "package", "", "", "p"),
      FactIn("a.java", "extends", "", "p.A", "B"),
      FactIn("b.java", "extends", "", "p.B", "A"))
    val cat = buildCatalog(defs, facts, Nil)
    assert(cat.superClosure("p.A") === Set("p.A", "p.B"))
    assert(cat.superClosure("p.B") === Set("p.A", "p.B"))
  }

  test("diamond: D extends B,C; B,C extend A — closure has each vertex once") {
    val defs = Seq(
      DefIn(1, "p.A", "A", "Class", "f.java"),
      DefIn(2, "p.B", "B", "Interface", "f.java"),
      DefIn(3, "p.C", "C", "Interface", "f.java"),
      DefIn(4, "p.D", "D", "Class", "f.java"))
    val facts = Seq(
      FactIn("f.java", "package", "", "", "p"),
      FactIn("f.java", "extends", "", "p.B", "A"),
      FactIn("f.java", "extends", "", "p.C", "A"),
      FactIn("f.java", "extends", "", "p.D", "B"),
      FactIn("f.java", "extends", "", "p.D", "C"))
    val cat = buildCatalog(defs, facts, Nil)
    assert(cat.superClosure("p.D") === Set("p.D", "p.B", "p.C", "p.A"))
  }

  test("shadowing precedence: enclosing nested member, then import, then " +
    "same package, then wildcard package") {
    // the simple name "Target" exists in all four lookup positions
    val defs = Seq(
      DefIn(1, "p.Outer", "Outer", "Class", "f.java"),
      DefIn(2, "p.Outer.Target", "Target", "Class", "f.java"), // nested
      DefIn(3, "q.Target", "Target", "Class", "imp.java"), // imported
      DefIn(4, "p.Target", "Target", "Class", "same.java"), // same package
      DefIn(5, "w.Target", "Target", "Class", "wild.java")) // wildcard pkg
    val facts = Seq(
      FactIn("f.java", "package", "", "", "p"),
      FactIn("imp.java", "package", "", "", "q"),
      FactIn("same.java", "package", "", "", "p"),
      FactIn("wild.java", "package", "", "", "w"))
    val imps = Seq(
      ImpIn(100, "q.Target", "Target", null, "f.java"),
      ImpIn(101, "w", "*", null, "f.java"))
    val cat = buildCatalog(defs, facts, imps)
    val cands = cat.resolveHeadType("f.java", "p.Outer", "Target")
    assert(cands === Seq("p.Outer.Target", "q.Target", "p.Target", "w.Target"))
    // from OUTSIDE the enclosing scope the nested member no longer leads
    val cands2 = cat.resolveHeadType("f.java", "", "Target")
    assert(cands2 === Seq("q.Target", "p.Target", "w.Target"))
  }
}
