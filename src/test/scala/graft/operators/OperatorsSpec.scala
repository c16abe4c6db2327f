package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.{Embeddings, Sampling}

/** Unit coverage for the scale-path operators: bucketed range join,
  * skew-salted join, deterministic sampling, embedding quantization.
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("Profile.table: per-column census hand-checked across types and nulls") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, Some("b"), None),
      (3L, None, Some(1.0)),
      (4L, Some("a"), Some(2.5))
    ).toDF("id", "tag", "score")
    val got = Profile.table(df).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got.keySet == Set("id", "tag", "score"))
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("tag") == ((4L, 1L, 2L, "a", "b"))) // nulls excluded from distinct/min/max
    assert(got("score") == ((4L, 1L, 2L, "1.0", "2.5")))
    // subset selection profiles only the named columns, in name order
    val sub = Profile.table(df, Seq("tag")).collect()
    assert(sub.length == 1 && sub.head.getString(0) == "tag")
  }

  test("Profile.expect: violations counted per rule, null predicate = violation") {
    val df = Seq(
      (Some(1L), Some(10.0)),
      (Some(2L), Some(60.0)), // range violation
      (None, Some(5.0)),      // null id
      (Some(4L), None)        // null value -> range predicate NULL = violation
    ).toDF("id", "v")
    val got = Profile.expect(df, Seq(
        "id_nonnull" -> col("id").isNotNull,
        "v_range" -> (col("v") >= 0 && col("v") <= 50)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("id_nonnull") == ((4L, 1L, false)))
    assert(got("v_range") == ((4L, 2L, false))) // 60.0 out of range + null
    val ok = Profile.expect(df.where(col("id").isNotNull),
      Seq("id_nonnull" -> col("id").isNotNull)).head()
    assert(ok.getLong(2) == 0L && ok.getBoolean(3))
    intercept[IllegalArgumentException](
      Profile.expect(df, Seq("a" -> lit(true), "a" -> lit(false))))
  }

  test("Profile: hostile column and rule names (quotes, backticks) are escaped") {
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("it's", "back`tick")
    val got = Profile.table(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("it's" -> 2L, "back`tick" -> 2L), got.toString)
    // caller-side: a lone backtick needs the escaped-identifier form
    // (col() parses attribute names); Profile does this internally
    val exp = Profile.expect(df, Seq(
        "rule'with\"quotes" -> col("`it's`").isNotNull,
        "rule`tick" -> (col("`back``tick`") =!= "")))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(exp == Map("rule'with\"quotes" -> true, "rule`tick" -> true))
  }

  test("ZOrder: hand-checked interleave; clustered boxes prune on the non-leading dim") {
    // bit-level hand check: x=2 (0b10), y=1 (0b01), d=2, bits=2 —
    // x bit1 -> pos 2, y bit0 -> pos 1: z = 0b110 = 6
    val one = Seq((2L, 1L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), bits = 2).as("z"))
    assert(one.head().getLong(0) == 6L)

    // 64x64 grid: z-cluster into 16 range partitions vs an x-sorted layout;
    // a range predicate on y (the NON-leading dimension for the x sort)
    // must touch far fewer z boxes — the whole point of the layout
    val grid = spark.range(4096).select((col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"))
    def touchedByYRange(df: org.apache.spark.sql.DataFrame): Int =
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg(min("y").as("lo"), max("y").as("hi"))
        .where(col("lo") <= 15 && col("hi") >= 0) // box intersects y in [0,15]
        .count().toInt
    val z = ZOrder.cluster(grid, Seq("x", "y"), bits = 6, numFiles = 16)
    val xSorted = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
    val zTouched = touchedByYRange(z)
    val xTouched = touchedByYRange(xSorted)
    assert(xTouched >= 15, s"x-sorted layout should span y everywhere: $xTouched")
    assert(zTouched * 2 <= xTouched,
      s"z layout must halve the touched boxes: z=$zTouched vs x=$xTouched")
    // the clustering permutes, never drops or duplicates
    assert(z.count() == 4096 && z.select("x", "y").distinct().count() == 4096)
  }

  test("RangeJoin.backwardWindow matches rows within the trailing window, " +
    "inclusive bounds, across bucket boundaries") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 01:00:00")),
      (2L, 10L, ts("2024-01-01 02:00:00")),
      (3L, 20L, ts("2024-01-01 01:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:30:00")), // 30 min before L1: in (boundary)
      (101L, 10L, ts("2024-01-01 00:59:59")), // 1s before L1: in, crosses bucket
      (102L, 10L, ts("2024-01-01 01:00:00")), // equal ts: in (inclusive)
      (103L, 10L, ts("2024-01-01 01:45:00")), // 15 min before L2: in
      (104L, 10L, ts("2024-01-01 00:29:59")), // 30m01s before L1: out
      (105L, 20L, ts("2024-01-01 01:00:01")), // after L3: out
      (106L, 99L, ts("2024-01-01 01:00:00")) // wrong key: out
    ).toDF("click_id", "c_user", "c_ts")
    val got = RangeJoin.backwardWindow(left, right,
        "user_id", "c_user", "ts", "c_ts", windowMicros = 1800000000L)
      .select("event_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 100L), (1L, 101L), (1L, 102L), (2L, 103L)))
  }

  test("property: RangeJoin equals the naive inequality join on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      key <- Gen.chooseNum(1L, 5L)
      // offsets straddle many bucket boundaries relative to the 1000s window
      sec <- Gen.chooseNum(0L, 20000L)
    } yield (key, sec)
    val listGen = Gen.listOfN(60, rowGen)
    (0 until 5).foreach { i =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = listGen.apply(Gen.Parameters.default, Seed(7L + i)).get
        .zipWithIndex.map { case ((k, sec), id) =>
          (id.toLong, k, new Timestamp(base + sec * 1000L)) }
      val left = rows.toDF("lid", "k", "ts")
      val right = rows.map { case (id, k, t) => (id + 1000L, k, t) }
        .toDF("rid", "rk", "rts")
      val wUs = 1000L * 1000000L // 1000s window
      val naive = left.join(right,
          $"k" === $"rk" &&
            unix_micros($"rts") >= unix_micros($"ts") - wUs &&
            unix_micros($"rts") <= unix_micros($"ts"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val bucketed = RangeJoin.backwardWindow(left, right,
          "k", "rk", "ts", "rts", wUs)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(bucketed === naive, s"seed ${7 + i}")
      assert(naive.nonEmpty)
    }
  }

  test("SaltedJoin.innerSalted returns exactly the unsalted inner-join rows") {
    val left = (1 to 200).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
    val right = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "z")).toDF("rk", "tag")
    val plain = left.join(right, $"k" === $"rk")
      .select("k", "v", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SaltedJoin.innerSalted(left, right, "k", "rk",
        saltBuckets = 5, saltOn = $"v")
      .select("k", "v", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("partition independence: sampling/packing results don't depend on " +
    "physical layout") {
    val docs = (1 to 200).map(i => (i.toLong, s"s${i % 4}", (i % 37).toLong))
      .toDF("id", "shard", "toks")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    Seq(docs.repartition(1), docs.repartition(13), docs.repartition(32))
      .foreach { laidOut =>
        assert(asSet(Sampling.hashPercent(laidOut, $"id", 25)) ===
          asSet(Sampling.hashPercent(docs, $"id", 25)))
        assert(asSet(Sampling.stratifiedTopK(laidOut, $"shard", $"id", 9)) ===
          asSet(Sampling.stratifiedTopK(docs, $"shard", $"id", 9)))
        assert(asSet(graft.pipeline.Packing.sequentialPacks(
            laidOut, $"shard", $"id", $"toks", 64)) ===
          asSet(graft.pipeline.Packing.sequentialPacks(
            docs, $"shard", $"id", $"toks", 64)))
      }
  }

  test("Sampling is deterministic and respects stratum bounds") {
    val docs = (1 to 300).map(i => (i.toLong, s"lang${i % 3}")).toDF("id", "lang")
    val s1 = Sampling.hashPercent(docs, $"id", 10).as[(Long, String)].collect().toSet
    val s2 = Sampling.hashPercent(docs, $"id", 10).as[(Long, String)].collect().toSet
    assert(s1 === s2)
    assert(s1.nonEmpty && s1.size < 100) // ~10% of 300, loose bound
    // percent=100 keeps everything, percent=0 nothing
    assert(Sampling.hashPercent(docs, $"id", 100).count() === 300)
    assert(Sampling.hashPercent(docs, $"id", 0).count() === 0)

    val st = Sampling.stratifiedTopK(docs, $"lang", $"id", 7)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(st === Map("lang0" -> 7L, "lang1" -> 7L, "lang2" -> 7L))
    val st1 = Sampling.stratifiedTopK(docs, $"lang", $"id", 7)
      .as[(Long, String)].collect().toSet
    val st2 = Sampling.stratifiedTopK(docs, $"lang", $"id", 7)
      .as[(Long, String)].collect().toSet
    assert(st1 === st2)
  }

  test("Sampling.weightedTopK: ES selection replays exactly; weight drives selection") {
    import graft.pipeline.Sampling
    val rows = (1L to 200L).map(i => (i, if (i <= 20) 100.0 else 1.0))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedTopK(df, col("id"), col("w"), 30)
      .select("id").as[Long].collect().toSet
    def fold(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val brute = rows.map { case (i, w) =>
        i -> (-math.log((fold(i.toString) + 1) / 1000000008.0) / w)
      }.sortBy { case (i, k) => (k, i) }.take(30).map(_._1).toSet
    assert(got == brute)
    // rows at 100x weight draw keys ~100x smaller: the 20 heavies dominate
    assert(got.count(_ <= 20L) >= 15, s"heavy rows selected: ${got.count(_ <= 20L)}")
    // deterministic: a rerun selects the identical set
    assert(Sampling.weightedTopK(df, col("id"), col("w"), 30)
      .select("id").as[Long].collect().toSet == got)
  }

  test("Sampling.mixture hits target proportions bounded by availability") {
    // 100 lang0, 100 lang1, 100 lang2 available
    val docs = (1 to 300).map(i => (i.toLong, s"lang${i % 3}")).toDF("id", "lang")
    // lang0 is the binding constraint: T = min(100/0.5, 100/0.25) = 200
    // -> take 100 lang0, 50 lang1; lang2 has no weight -> dropped
    val m = Sampling.mixture(docs, $"lang", $"id",
        Map("lang0" -> 0.5, "lang1" -> 0.25))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // weights renormalize to 2/3, 1/3: T = min(100/(2/3), 100/(1/3)) = 150
    // -> lang0 floor(150*2/3)=100, lang1 floor(150*1/3)=50
    assert(m === Map("lang0" -> 100L, "lang1" -> 50L), m.toString)
    // deterministic across runs
    val r1 = Sampling.mixture(docs, $"lang", $"id", Map("lang0" -> 0.5, "lang1" -> 0.25))
      .as[(Long, String)].collect().toSet
    val r2 = Sampling.mixture(docs, $"lang", $"id", Map("lang0" -> 0.5, "lang1" -> 0.25))
      .as[(Long, String)].collect().toSet
    assert(r1 === r2 && r1.size === 150)
    // equal weights, equal availability: everything kept
    val all = Sampling.mixture(docs, $"lang", $"id",
      Map("lang0" -> 1.0, "lang1" -> 1.0, "lang2" -> 1.0))
    assert(all.count() === 300)
    // a weighted group with nothing available makes the target proportions
    // unreachable: capacity 0, empty draw — never a silently skewed mixture
    val unreachable = Sampling.mixture(docs, $"lang", $"id",
      Map("lang0" -> 0.5, "langMissing" -> 0.5))
    assert(unreachable.count() === 0)
  }

  test("Sampling.tokenBudgetMixture: prefix cumsum semantics, budget never exceeded") {
    import graft.pipeline.Sampling
    def fold(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val docs = (1L to 60L).map(i => (i, s"g${i % 2}", 10L + i % 7)).toDF("id", "g", "toks")
    val budgets = Map("g0" -> 100L, "g1" -> 55L)
    val got = Sampling.tokenBudgetMixture(docs, $"g", $"id", $"toks", budgets)
      .select("id", "g", "cum_size").as[(Long, String, Long)].collect()
    // replay: per group, sort by (fold(id), id), admit the longest prefix
    // whose running total stays within budget (stop at the first overflow)
    val expectPrefix = docs.as[(Long, String, Long)].collect()
      .groupBy(_._2).toSeq.flatMap { case (g, rows) =>
        val ordered = rows.sortBy { case (i, _, _) => (fold(i.toString), i) }
        val cums = ordered.scanLeft(0L) { case (acc, (_, _, t)) => acc + t }.tail
        ordered.zip(cums).takeWhile(_._2 <= budgets(g))
          .map { case ((i, gg, _), c) => (i, gg, c) }
      }.toSet
    assert(got.toSet === expectPrefix, s"got=${got.toSet}\nexpect=$expectPrefix")
    // budgets hold: per-group admitted size <= budget
    val sums = got.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    assert(sums.forall { case (g, s) => s <= budgets(g) }, sums.toString)
    // a group without a budget is dropped entirely
    assert(got.forall(r => budgets.contains(r._2)))
    // deterministic across runs
    val again = Sampling.tokenBudgetMixture(docs, $"g", $"id", $"toks", budgets)
      .select("id", "g", "cum_size").as[(Long, String, Long)].collect().toSet
    assert(again === got.toSet)
  }

  test("Sampling.tokenBudgetMixture: first overflow stops the group scan (prefix, not best-fit)") {
    import graft.pipeline.Sampling
    def fold(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    // order within the group is by id-hash: find the hash order first, then
    // give the SECOND doc a size that overflows — the third must be excluded
    // even though it alone would fit (prefix semantics)
    val ids = Seq(1L, 2L, 3L).sortBy(i => (fold(i.toString), i))
    val sizes = Map(ids(0) -> 10L, ids(1) -> 100L, ids(2) -> 5L)
    val docs = ids.map(i => (i, "g", sizes(i))).toDF("id", "g", "toks")
    val got = Sampling.tokenBudgetMixture(docs, $"g", $"id", $"toks",
        Map("g" -> 20L))
      .select("id").as[Long].collect().toSet
    assert(got === Set(ids(0)), s"expected only ${ids(0)}, got $got")
  }

  test("Packing.sequentialPacks: boundary-aligned packs per shard") {
    val docs = Seq(
      // shard a: tokens 300, 300, 100 -> starts 0, 300, 600
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 100L),
      // shard b: tokens 600 (overflows budget alone), 10 -> starts 0, 600
      (4L, "b", 600L), (5L, "b", 10L)
    ).toDF("id", "shard", "toks")
    val got = graft.pipeline.Packing.sequentialPacks(docs,
        $"shard", $"id", $"toks", budget = 512)
      .select("id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L),
      (4L, 0L, 0L), (5L, 1L, 88L)))
  }

  test("Dedup.clusterKeepers: transitive chains collapse to one keeper") {
    // chain 1-2-3-4 (diameter 3) + separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = graft.pipeline.Dedup.clusterKeepers(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("Dedup.benchmarkOverlap flags docs sharing an n-gram with the bench set") {
    val mk = (i: Long, t: String) => (i, t)
    val corpus = Seq(
      mk(10L, "alpha beta gamma delta shared tail"), // shares 4-gram w/ bench
      mk(11L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val bench = Seq(mk(1L, "alpha beta gamma delta other ending"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.Dedup.benchmarkOverlap(
        corpus, "doc_id", "text", bench, "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 1L))
  }

  test("GraftExtensions injects SQL functions via spark.sql.extensions") {
    // newSession(): fresh session state built from the session extensions
    // (configured in SparkSpec's builder) — temp functions registered at
    // runtime by VectorExpressions.register are NOT carried over, so this
    // resolves only if the extension injection works
    val s2 = spark.newSession()
    val r = s2.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_charfold('ab', 31) AS h,
                graft_minhash_sig(array('x'), 4) AS mh,
                graft_shingle_list('a b a b', 2) AS sl""").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 97L * 31 + 98) // fold of 'a','b'
    assert(r.getSeq[Long](2).length === 4)
    assert(r.getSeq[String](3) === Seq("a b", "b a", "a b")) // ordered, dups kept
  }

  test("MinHashSig: codegen equals interpreted equals the per-slot formula") {
    import graft.functions.TextFunctions
    val shingles = Seq("alpha beta", "gamma delta", "zeta")
    val df = Seq(Tuple1(shingles)).toDF("sh")
    val viaExpr = df.select(
        graft.functions.VectorExpressions.minHashSig($"sh", 8).as("mh"))
      .head().getSeq[Long](0)
    // reference computation: min over shingles of (a_i*charfold31(s)+b_i)%M
    def fold(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val expect = (0 until 8).map { i =>
      shingles.map(s => (TextFunctions.coeffA(i) * fold(s) +
        TextFunctions.coeffB(i)) % 1000000007L).min
    }
    assert(viaExpr.toSeq === expect)
    // interpreted path (direct eval, no codegen) agrees
    val interp = graft.functions.MinHashSig(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        shingles, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(8))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(interp === expect)
  }

  test("NfcNormalize: composes decomposed text; codegen equals interpreted; NFC fast path") {
    // "cafe" + combining acute, "A" + combining ring — canonical composition
    val decomposed = "café Å"
    val composed = "café Å"
    graft.functions.VectorExpressions.register(spark)
    val df = Seq(Tuple1(decomposed)).toDF("s")
    val viaExpr = df.select(
      graft.functions.VectorExpressions.nfc($"s").as("n")).head().getString(0)
    assert(viaExpr == composed)
    // interpreted path agrees (direct eval, no codegen)
    def interp(s: String) = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        s, org.apache.spark.sql.types.StringType))
      .eval(null).toString
    assert(interp(decomposed) == composed)
    // already-NFC input is returned unchanged (incl. plain ASCII)
    assert(interp(composed) == composed)
    assert(interp("plain ascii text") == "plain ascii text")
    // idempotence
    assert(interp(interp(decomposed)) == composed)
  }

  test("Embeddings: l2Normalize yields unit vectors, quantizeInt8 stays in " +
    "[-127,127], zero vectors dropped") {
    val embs = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(-1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f)) // zero vector: dropped
    ).toDF("vec_id", "embedding")
    val unit = Embeddings.l2Normalize(embs, "vec_id", "embedding")
      .select($"vec_id", aggregate(transform($"unit", x => x * x),
        lit(0.0), (a, x) => a + x).as("sq"))
      .as[(Long, Double)].collect().toMap
    assert(unit.keySet === Set(1L, 2L))
    unit.values.foreach(sq => assert(math.abs(sq - 1.0) < 1e-9))

    val qv = Embeddings.quantizeInt8(embs, "vec_id", "embedding")
      .as[(Long, Int, Int)].collect()
    assert(qv.map(_._1).toSet === Set(1L, 2L))
    qv.foreach { case (_, _, q) => assert(q >= -127 && q <= 127) }
    // (3,4)/5*127 = (76.2, 101.6) -> (76, 102)
    val v1 = qv.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(v1 === Seq(76, 102))
    val v2 = qv.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq
    assert(v2 === Seq(-127, 0))
  }
}
