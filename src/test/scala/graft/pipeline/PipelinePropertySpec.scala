package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property coverage for the round-6 operators: the winnowing guarantee,
  * RRF fusion arithmetic, containment on constructed subranges, and the
  * EWMA fold — each pinned against an independent driver-side model over
  * randomly generated inputs rather than one hand-picked fixture.
  */
class PipelinePropertySpec extends SparkSpec {

  /** Deterministic sampling, the repo's established pattern
    * (scalatestplus is not in the offline cache).
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      check(gen.apply(Gen.Parameters.default, Seed(4242L + i)).get)
    }

  private val word: Gen[String] = for {
    len <- Gen.choose(2, 6)
    cs <- Gen.listOfN(len, Gen.alphaLowerChar)
  } yield cs.mkString

  // random kind-tagged edge list over `n` vertices (DEF_TO_DEF ids)
  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(6, 14)
    m <- Gen.choose(n, 3 * n)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(1, n); b <- Gen.choose(1, n)
    } yield (a.toLong, b.toLong))
  } yield es

  private def edgeDfOf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.map { case (s, t) => ("DEF_TO_DEF", s, t) }
      .toDF("kind", "source_id", "target_id")
  }

  // driver-side canonical undirected edge set (packed DEF ids)
  private def canonOf(es: Seq[(Long, Long)]): Set[(Long, Long)] =
    es.collect { case (a, b) if a != b =>
      val (u, v) = (math.min(a, b), math.max(a, b))
      ((3L << 32) + u, (3L << 32) + v)
    }.toSet

  private def triCountOf(canon: Set[(Long, Long)]): Long = {
    val vs = canon.flatMap { case (u, v) => Seq(u, v) }.toSeq.sorted
    val has = (a: Long, b: Long) => canon((math.min(a, b), math.max(a, b)))
    (for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      if has(vs(i), vs(j)) && has(vs(j), vs(k)) && has(vs(i), vs(k))
    } yield 1).size.toLong
  }

  test("property: TriangleStore admissions in any split order equal the " +
    "brute-force census of the union") {
    forAllSeeded(graphGen, 8) { es =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-tri-prop").toString + "/s"
      // random-ish 3-way split by a simple hash of the edge
      val parts = es.groupBy { case (a, b) => ((a * 31 + b) % 3).toInt }
      val st = graft.store.TriangleStore.build(spark, dir,
        edgeDfOf(parts.getOrElse(0, Nil)))
      st.admit(edgeDfOf(parts.getOrElse(1, Nil)))
      st.admit(edgeDfOf(parts.getOrElse(2, Nil)))
      val canon = canonOf(es)
      assert(st.stats == ((canon.size.toLong, triCountOf(canon))),
        s"edges=$es")
      assert(st.validate())
    }
  }

  test("property: kCore equals the brute-force peel on random graphs") {
    forAllSeeded(graphGen, 8) { es =>
      val k = 3
      // driver-side reference peel
      var canon = canonOf(es)
      var changed = true
      while (changed) {
        val deg = canon.toSeq.flatMap { case (u, v) => Seq(u, v) }
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val pruned = canon.filter { case (u, v) => keep(u) && keep(v) }
        changed = pruned.size != canon.size
        canon = pruned
      }
      val wantDeg = canon.toSeq.flatMap { case (u, v) => Seq(u, v) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = graft.graph.GraphOps.kCore(edgeDfOf(es), k)
        .collect()
        .map(r => ((r.getAs[Long]("tag") << 32) + r.getAs[Long]("id")) ->
          r.getAs[Long]("core_degree")).toMap
      assert(got == wantDeg, s"edges=$es")
    }
  }

  test("property: labelPropagation equals a driver-side sync simulation") {
    forAllSeeded(graphGen, 8) { es =>
      val rounds = 3
      val canon = canonOf(es)
      val adj = canon.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
      (1 to rounds).foreach { _ =>
        lbl = adj.map { case (v, ns) =>
          val counts = ns.map(lbl).groupBy(identity).view.mapValues(_.size)
          // most frequent, ties to smallest label
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      val got = graft.graph.GraphOps.labelPropagation(edgeDfOf(es), rounds)
        .collect()
        .map(r => ((r.getAs[Long]("tag") << 32) + r.getAs[Long]("id")) ->
          r.getAs[Long]("label")).toMap
      assert(got == lbl, s"edges=$es")
    }
  }

  test("property: z-values of every point in a box lie within the corner z-range") {
    import spark.implicits._
    // Morton order is monotone per coordinate (a coordinate's bits occupy
    // fixed interleave positions, so its most-significant differing bit
    // decides), hence z(minCorner) <= z(p) <= z(maxCorner) for any p in an
    // axis-aligned box — the property file-level min/max pruning rests on
    val gen = for {
      x0 <- Gen.choose(0, 200); x1 <- Gen.choose(x0, 255)
      y0 <- Gen.choose(0, 200); y1 <- Gen.choose(y0, 255)
      pts <- Gen.listOfN(20, for {
        px <- Gen.choose(x0, x1); py <- Gen.choose(y0, y1)
      } yield (px.toLong, py.toLong))
    } yield ((x0.toLong, y0.toLong), (x1.toLong, y1.toLong), pts)
    forAllSeeded(gen, 12) { case ((x0, y0), (x1, y1), pts) =>
      val rows = ((x0, y0) +: (x1, y1) +: pts).toDF("x", "y")
      val zs = rows.select(graft.operators.ZOrder
          .zvalue(Seq(col("x"), col("y")), bits = 8).as("z"))
        .collect().map(_.getLong(0))
      val (zLo, zHi) = (zs(0), zs(1))
      assert(zLo <= zHi)
      zs.drop(2).foreach(z =>
        assert(z >= zLo && z <= zHi, s"z=$z outside [$zLo,$zHi]"))
    }
  }

  test("property: triangle delta equals the census difference on random graphs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(15, 40)
      density <- Gen.choose(2, 5)
      salt <- Gen.choose(1, 1000)
      splitMod <- Gen.choose(2, 6)
    } yield (n, density, salt, splitMod)
    forAllSeeded(gen, 8) { case (n, density, salt, splitMod) =>
      val all = for {
        u <- 0 until n; v <- (u + 1) until n
        if ((u * 31 + v * 17 + salt) % 10) < density
      } yield ("DEF_TO_DEF", u.toLong, v.toLong)
      val (nw, seen) = all.partition { case (_, u, v) => (u + v) % splitMod == 0 }
      if (all.nonEmpty) {
        val allDf = all.toDF("kind", "source_id", "target_id")
        val seenDf = seen.toDF("kind", "source_id", "target_id")
        val (nNew, delta) = graft.graph.GraphOps.triangleDelta(
          nw.toDF("kind", "source_id", "target_id"), seenDf)
        val expect = graft.graph.GraphOps.exactTriangleCount(allDf) -
          graft.graph.GraphOps.exactTriangleCount(seenDf)
        assert(delta == expect, s"n=$n d=$density salt=$salt mod=$splitMod")
        assert(nNew == nw.size)
      }
    }
  }

  test("property: winnowing detects every planted shared run >= w+k-1 tokens") {
    import spark.implicits._
    val k = 4; val w = 4
    val gen = for {
      runLen <- Gen.choose(w + k - 1, 12) // at or above the threshold
      run <- Gen.listOfN(runLen, word)
      padA <- Gen.listOfN(8, word)
      padB <- Gen.listOfN(8, word)
      padC <- Gen.listOfN(8, word)
    } yield (run, padA, padB, padC)
    forAllSeeded(gen, 12) { case (run, padA, padB, padC) =>
      val docA = (padA ++ run ++ padB).mkString(" ")
      val docB = (padC ++ run).mkString(" ")
      val fps = Dedup.winnowFingerprints(
          Seq((0L, docA), (1L, docB)).toDF("doc_id", "text"),
          "doc_id", "text", k = k, w = w)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val a = fps.filter(_._1 == 0L).map(_._2).toSet
      val b = fps.filter(_._1 == 1L).map(_._2).toSet
      assert((a & b).nonEmpty,
        s"planted ${run.size}-token run must share a fingerprint")
    }
  }

  test("property: rrf fusion equals the driver-side formula on random lists") {
    import spark.implicits._
    val gen = for {
      nLex <- Gen.choose(0, 12)
      nSem <- Gen.choose(0, 12)
      lexIds <- Gen.pick(nLex, 0L to 30L)
      semIds <- Gen.pick(nSem, 0L to 30L)
    } yield (lexIds.toSeq, semIds.toSeq)
    forAllSeeded(gen, 15) { case (lexIds, semIds) =>
      val lex = lexIds.zipWithIndex.map { case (id, i) => (id, i + 1) }
      val sem = semIds.zipWithIndex.map { case (id, i) => (id, i + 1) }
      val got = Search.rrfFuse(lex.toDF("doc_id", "rank"),
          sem.toDF("doc_id", "rank"), k0 = 60, k = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val lm = lex.toMap; val sm = sem.toMap
      def r6(v: Double) = math.round(v * 1e6) / 1e6
      val model = (lm.keySet ++ sm.keySet).toSeq.map { id =>
        id -> r6(lm.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          sm.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
      }.sortBy { case (id, s) => (-s, id) }
      assert(got.map(t => (t._1, t._2)).toSeq == model, s"lex=$lex sem=$sem")
      assert(got.map(_._3).toSeq == (1 to model.size))
    }
  }

  test("property: a doc whose tokens are a subrange of another has containment 1") {
    import spark.implicits._
    val gen = for {
      nB <- Gen.choose(8, 20)
      toksB <- Gen.listOfN(nB, word)
      start <- Gen.choose(0, nB - 5)
      len <- Gen.choose(5, nB - start)
    } yield (toksB, start, len)
    forAllSeeded(gen, 12) { case (toksB, start, len) =>
      val sub = toksB.slice(start, start + len)
      val df = Seq((0L, sub.mkString(" ")), (1L, toksB.mkString(" ")))
        .toDF("doc_id", "text")
      val rows = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
        threshold = 0.0).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // every 3-gram of the subrange occurs in the superstring
      assert(rows.get((0L, 1L)).contains(1.0), s"sub=$sub of=$toksB: $rows")
    }
  }

  test("property: prefix-filtered containment equals the direct census") {
    import spark.implicits._
    // corpora with engineered overlap: subranges, exact dups, disjoint docs
    val gen = for {
      base <- Gen.listOfN(14, word)
      start <- Gen.choose(0, 8)
      len <- Gen.choose(5, 6)
      other <- Gen.listOfN(10, word)
    } yield Seq(
      0L -> base.mkString(" "),
      1L -> base.slice(start, start + len).mkString(" "), // subrange of 0
      2L -> base.mkString(" "),                            // exact dup of 0
      3L -> other.mkString(" "))
    forAllSeeded(gen, 10) { docsSeq =>
      val df = docsSeq.toDF("doc_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toSet
      val direct = rows(Dedup.containmentPairs(df, "doc_id", "text", 3, 0.8))
      val prefix = rows(Dedup.containmentPairsPrefix(df, "doc_id", "text", 3, 0.8))
      assert(direct == prefix, s"direct $direct\nprefix $prefix")
      assert(direct.nonEmpty) // the engineered dup/subrange pairs exist
    }
  }

  test("property: ewma equals the recursive definition on random series") {
    import spark.implicits._
    import java.sql.Timestamp
    val gen = for {
      n <- Gen.choose(1, 15)
      xs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield xs
    forAllSeeded(gen, 12) { xs =>
      val rows = xs.zipWithIndex.map { case (x, i) =>
        (i.toLong, new Timestamp(1700000000000L + i * 1000), 1L, x)
      }
      val got = TimeSeries.ewmaByKey(
          rows.toDF("event_id", "ts", "user_id", "value"),
          "user_id", Seq("ts", "event_id"), "value", alpha = 0.3)
        .collect().head.getAs[Double]("ewma")
      val model = xs.tail.foldLeft(xs.head)((acc, x) => 0.3 * x + 0.7 * acc)
      assert(got == math.round(model * 10000) / 10000.0, s"xs=$xs")
    }
  }
}
