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
      .select(lit("b_crash").as("batch_key"), $"j", $"bucket", $"cnt")
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/batches")
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
}
