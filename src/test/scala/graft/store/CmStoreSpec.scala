package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode
import graft.SparkSpec
import graft.pipeline.Sketches

/** Persisted Count-Min store: split build+append == one-shot sketch,
  * exactly-once replay guard, half-landed-batch detection/repair,
  * compaction invariance, and the streaming admission twin.
  */
class CmStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
    (0 until 30).map(i => s"tail$i")).zipWithIndex
    .map { case (s, i) => (i.toLong, s) }

  private def estMap(st: CmStore) =
    st.estimate(Seq("alpha", "beta", "tail0", "ghost").toDF("item"), "item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("build + append lands on the one-shot sketch; replayed key no-ops") {
    val dir = Files.createTempDirectory("graft-cm").toString + "/cm"
    val df = corpus.toDF("id", "item")
    val st = CmStore.build(spark, dir, df.where($"id" % 2 === 0), "item",
      depth = 4, width = 64)
    assert(st.append(df.where($"id" % 2 =!= 0), "b1"))
    // replay of an admitted key: refused, counters unchanged
    val before = estMap(st)
    assert(!st.append(df.where($"id" % 2 =!= 0), "b1"))
    assert(estMap(st) == before)
    // estimates == direct one-shot sketch estimates (merge linearity)
    val oneShot = Sketches.cmEstimate(
        Sketches.countMin(df, "item", 4, 64),
        Seq("alpha", "beta", "tail0", "ghost").toDF("item"), "item", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before == oneShot)
    assert(before("alpha") >= 40L && before("beta") >= 25L)
    assert(st.totalItems == 95L)
    assert(st.validate())
  }

  test("half-landed batch: excluded from reads, validate flags, repair " +
    "drops, the retry re-admits") {
    val dir = Files.createTempDirectory("graft-cm2").toString + "/cm"
    val df = corpus.toDF("id", "item")
    val st = CmStore.build(spark, dir, df.where($"id" < 50), "item",
      depth = 4, width = 64)
    val clean = estMap(st)
    // manufacture the crash artifact: a batch's cell rows WITHOUT the
    // marker row (object-store partial append / manual tampering)
    Sketches.countMin(df.where($"id" >= 50), "item", 4, 64)
      .select(lit("b_crash").as("batch_key"), lit(0).as("__marker"),
        $"j", $"bucket", $"cnt")
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(StoreCompaction.appendTarget(spark, s"$dir/batches"))
    spark.catalog.refreshByPath(
      StoreCompaction.appendTarget(spark, s"$dir/batches"))
    assert(!st.validate())
    assert(estMap(st) == clean, "half-landed cells must not be readable")
    st.repair()
    assert(st.validate())
    // the same key is free again: the retry admits exactly once
    assert(st.append(df.where($"id" >= 50), "b_crash"))
    val oneShot = Sketches.cmEstimate(
        Sketches.countMin(df, "item", 4, 64),
        Seq("alpha", "beta", "tail0", "ghost").toDF("item"), "item", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estMap(st) == oneShot)
  }

  test("compact folds history, keeps estimates and the replay guard") {
    val dir = Files.createTempDirectory("graft-cm3").toString + "/cm"
    val df = corpus.toDF("id", "item")
    val st = CmStore.build(spark, dir, df.where($"id" < 30), "item",
      depth = 4, width = 64)
    st.append(df.where($"id" >= 30 && $"id" < 60), "b1")
    st.append(df.where($"id" >= 60), "b2")
    val before = estMap(st)
    st.compact()
    assert(estMap(st) == before)
    assert(st.validate())
    // guard survives compaction: the folded keys still refuse replays
    assert(!st.append(df.where($"id" >= 60), "b2"))
    assert(estMap(st) == before)
  }

  test("hist store: append/replay/compact preserve quantiles; crash " +
    "artifact detected and repaired") {
    val dir = Files.createTempDirectory("graft-hs").toString + "/hs"
    import spark.implicits._
    val vals = (1 to 100).map(i => ("g", i * 1.5)) ++
      Seq(("g", -42.0), ("g", 0.0), ("h", 7.0))
    val df = vals.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("key", "value", "id")
    val st = HistStore.build(spark, dir, df.where($"id" % 2 === 0),
      "key", "value")
    assert(st.append(df.where($"id" % 2 =!= 0), "b1"))
    assert(!st.append(df.where($"id" % 2 =!= 0), "b1")) // replay refused
    def qmap(s: HistStore) = s.quantiles(Seq(0.5, 0.9)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val got = qmap(st)
    // one-shot parity via linearity
    val oneShot = Sketches.histQuantiles(
        Sketches.histSketch(df, "key", "value"), Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got == oneShot)
    // containment of the true rank values
    val g = vals.filter(_._1 == "g").map(v => math.round(v._2 * 10000)).sorted
    for (q <- Seq(0.5, 0.9)) {
      val exact = g(math.ceil(q * g.size).toInt - 1)
      val (lo, hi) = got(("g", q))
      assert(exact >= lo && exact <= hi, s"q=$q: $exact not in [$lo,$hi]")
    }
    st.compact()
    assert(qmap(st) == got && st.validate())
    assert(!st.append(df.where($"id" % 2 =!= 0), "b1")) // guard survives
    // crash artifact: cells without marker -> flagged, excluded, repaired
    Sketches.histSketch(df, "key", "value")
      .select(lit("b_crash").as("batch_key"), lit(0).as("__marker"),
        $"key", $"sgn", $"nd", $"p2", $"lo4", $"hi4", $"cnt")
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(StoreCompaction.appendTarget(spark, s"$dir/batches"))
    spark.catalog.refreshByPath(
      StoreCompaction.appendTarget(spark, s"$dir/batches"))
    assert(!st.validate())
    assert(qmap(st) == got)
    st.repair()
    assert(st.validate() && qmap(st) == got)
  }

  test("streaming heavy hitters: superset of the true heavy set, " +
    "estimates never undercount") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-shh").toString + "/hh"
    graft.stream.StreamingHeavyHitters.init(spark, dir, "item",
      depth = 4, width = 256)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val q = graft.stream.StreamingHeavyHitters
      .writer(input.toDF().toDF("item"), dir, "item", mgK = 8)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    // two waves: 'hot' heavy across both, 'warm' heavy in wave 2 only
    input.addData(Seq.fill(60)("hot") ++ (0 until 40).map(i => s"c$i"): _*)
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    // a separate query instance must (a) namespace its keys — a fresh
    // checkpoint restarts batch ids at 0 and the guard would refuse its
    // batches — and (b) read its OWN source: an uncheckpointed query on
    // the same MemoryStream would re-deliver wave 1 under the new prefix
    // and double-count (the documented id-based exactly-once contract)
    val input2 = MemoryStream[String]
    val q2 = graft.stream.StreamingHeavyHitters
      .writer(input2.toDF().toDF("item"), dir, "item", mgK = 8,
        keyPrefix = "wave2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    input2.addData(Seq.fill(30)("hot") ++ Seq.fill(50)("warm") ++
      (40 until 60).map(i => s"c$i"): _*)
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    val got = graft.stream.StreamingHeavyHitters.topK(spark, dir, phi = 0.2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stream total 200; phi=0.2 -> threshold 40: true heavy = hot(90), warm(50)
    val truth = Map("hot" -> 90L, "warm" -> 50L)
    truth.foreach { case (k, n) =>
      assert(got.contains(k), s"missing true heavy item $k in $got")
      assert(got(k) >= n, s"undercounted $k: ${got(k)} < $n")
    }
    // and nothing wildly infrequent sneaks in below the CM floor
    assert(got.keySet.forall(k => truth.contains(k) || got(k) >= 40L))
  }

  test("streaming admission: micro-batches land exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-cm4").toString + "/cm"
    val df = corpus.toDF("id", "item")
    CmStore.build(spark, dir, df.where($"id" < 40), "item",
      depth = 4, width = 64)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val q = graft.stream.StreamingCm.writer(input.toDF().toDF("item"), dir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    input.addData(corpus.drop(40).map(_._2): _*)
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val st = new CmStore(dir, spark)
    val oneShot = Sketches.cmEstimate(
        Sketches.countMin(df, "item", 4, 64),
        Seq("alpha", "beta", "tail0", "ghost").toDF("item"), "item", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estMap(st) == oneShot)
    assert(st.totalItems == 95L)
  }

  test("bloom store: idempotent admission, streamed == one-shot bits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-bf").toString + "/bf"
    import spark.implicits._
    val all = (0 until 300).map(i => s"id$i").toDF("item")
    val st = BloomStore.build(spark, dir, all.where($"item" < "id2"),
      "item", k = 3, width = 1024)
    st.admit(all.where($"item" >= "id2"))
    st.admit(all.where($"item" >= "id2")) // replay: bit-OR idempotent
    val oneShot = Sketches.bloomBits(all, "item", 3, 1024)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(st.bits.collect().map(_.getLong(0)).sorted.toSeq == oneShot)
    // every admitted id probes maybe_seen
    assert(st.probe(all).collect().forall(_.getBoolean(1)))
    // streaming face: a second store fed by micro-batches lands on the
    // same bits (no ledger, no key discipline needed)
    val dir2 = Files.createTempDirectory("graft-bf2").toString + "/bf"
    BloomStore.build(spark, dir2, all.where($"item" < "id2"), "item",
      k = 3, width = 1024)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val q = graft.stream.StreamingBloom
      .writer(input.toDF().toDF("item"), dir2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    input.addData((0 until 300).map(i => s"id$i").filter(_ >= "id2"): _*)
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    assert(new BloomStore(dir2, spark).bits
      .collect().map(_.getLong(0)).sorted.toSeq == oneShot)
  }

  test("streaming hist admission: streamed quantiles == one-shot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-hs2").toString + "/hs"
    import spark.implicits._
    val all = (1 to 100).map(i => ("g", i * 2.0))
    val df = all.toDF("key", "value")
    HistStore.build(spark, dir, df.where($"value" <= 100), "key", "value")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = graft.stream.StreamingHist
      .writer(input.toDF().toDF("key", "value"), dir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    input.addData(all.filter(_._2 > 100): _*)
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val got = new HistStore(dir, spark).quantiles(Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(1) -> (r.getLong(3), r.getLong(4))).toMap
    val oneShot = Sketches.histQuantiles(
        Sketches.histSketch(df, "key", "value"), Seq(0.5, 0.99))
      .collect().map(r => r.getDouble(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == oneShot)
  }

  test("heavy-hitter init reopens an existing store instead of wiping it") {
    val dir = Files.createTempDirectory("graft-hh-init").toString + "/hh"
    val (st, _) = graft.stream.StreamingHeavyHitters.init(spark, dir, "item")
    graft.stream.StreamingHeavyHitters.processBatch(
      corpus.toDF("id", "item"), dir, "item", mgK = 8, batchKey = "b0")
    val before = estMap(st)
    assert(before("alpha") >= 40L)
    // a restart calls init() again — counters and candidates must survive
    val (st2, _) = graft.stream.StreamingHeavyHitters.init(spark, dir, "item")
    assert(estMap(st2) == before, "init on existing store must reopen, not wipe")
    assert(graft.stream.StreamingHeavyHitters.topK(spark, dir, 0.2)
      .collect().map(_.getString(0)).toSet == Set("alpha", "beta"))
  }

  test("crash between CM append and candidate write cannot lose candidates " +
    "(candidates are written before the idempotency check)") {
    val dir = Files.createTempDirectory("graft-hh-crash").toString + "/hh"
    graft.stream.StreamingHeavyHitters.init(spark, dir, "item")
    val batch = corpus.toDF("id", "item")
    // simulate the OLD failure mode: the CM append for batch key b1 has
    // already committed (crash happened after it, before candidates)
    new CmStore(s"$dir/cm", spark).append(batch, "b1")
    // the replayed batch sees append()==false — candidates must land anyway
    graft.stream.StreamingHeavyHitters.processBatch(
      batch, dir, "item", mgK = 8, batchKey = "b1")
    val hh = graft.stream.StreamingHeavyHitters.topK(spark, dir, 0.2)
      .collect().map(_.getString(0)).toSet
    assert(hh == Set("alpha", "beta"),
      s"replay after partial commit must preserve candidates, got $hh")
  }
}
