package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end persisted-store round-trip on the DataSource V2 read path
  * (round-13 item): the stores always read through V1 in normal operation
  * (parquet sits on the default `useV1SourceList`), but nothing should
  * DEPEND on that — FileStatusCache behavior, relation caching, and leaf
  * shapes all differ on V2, and the TransientCache leaf extraction was the
  * only V2-specific coverage. This drives a full store lifecycle —
  * build → query → append → query → retire → compact (generational
  * swap) → query — with parquet dropped from the V1 list, and pins every
  * answer to the V1 twin's.
  */
class DsV2RoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(ids: Range) = ids.map { i =>
    (i.toLong, s"shared prefix words ${if (i % 3 == 0) "triplet tail" else s"solo $i"} end")
  }.toDF("doc_id", "text")

  test("DedupIndexStore lifecycle under useV1SourceList=\"\" equals the " +
    "V1 run: build, append, retire, compact, query") {
    def lifecycle(tag: String): (Seq[Long], Seq[Long], (Int, Int, Int)) = {
      val dir = Files.createTempDirectory(s"graft-v2rt-$tag").toString + "/idx"
      val st = DedupIndexStore.build(spark, dir, docsDf(0 until 30),
        "doc_id", "text", numHashes = 16, bands = 8)
      val afterBuild = st.shingles.select("doc_id").as[Long]
        .collect().sorted.toSeq
      st.append(docsDf(30 until 50), "doc_id", "text", autoCompactFiles = 0)
      st.retire(Seq(5L, 35L).toDF("doc_id"), "doc_id")
      st.compact()
      val afterAll = st.shingles.select("doc_id").as[Long]
        .collect().sorted.toSeq
      (afterBuild, afterAll, st.params)
    }
    val v1 = lifecycle("v1")
    val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    val v2 = try {
      // premise check: parquet really resolves through DSv2 now
      val probeDir = Files.createTempDirectory("graft-v2probe").toString + "/t"
      Seq(1, 2).toDF("v").write.parquet(probeDir)
      assert(spark.read.parquet(probeDir).queryExecution.analyzed
        .collectLeaves().exists(
          _.getClass.getSimpleName == "DataSourceV2Relation"),
        "expected a DSv2 leaf under useV1SourceList=\"\"")
      lifecycle("v2")
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", prev)
    assert(v2 == v1, s"V2 lifecycle diverged from V1: $v2 vs $v1")
    assert(v1._2 == ((0L until 50L).filterNot(i => i == 5L || i == 35L)),
      "lifecycle must land on the retired-compacted survivor set")
  }

  test("CorpusStore publish/append/compact under useV1SourceList=\"\" " +
    "equals the V1 run") {
    def lifecycle(tag: String): (Long, Seq[(Int, Long)], Long) = {
      val dir = Files.createTempDirectory(s"graft-v2corp-$tag").toString + "/c"
      CorpusStore.write(spark, dir, docsDf(0 until 40), "doc_id", "text",
        nShards = 4)
      CorpusStore.append(spark, dir, docsDf(40 until 55), "doc_id", "text",
        autoCompactFiles = 0)
      CorpusStore.compact(spark, dir)
      val mf = CorpusStore.manifest(spark, dir).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).toSeq
      (CorpusStore.docs(spark, dir).count(), mf,
        CorpusStore.validate(spark, dir, "doc_id", "text"))
    }
    val v1 = lifecycle("v1")
    val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    val v2 = try lifecycle("v2")
      finally spark.conf.set("spark.sql.sources.useV1SourceList", prev)
    assert(v2 == v1, s"V2 corpus lifecycle diverged: $v2 vs $v1")
    assert(v1._1 == 55L && v1._3 == 0L)
  }
}
