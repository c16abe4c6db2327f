package graft.store

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crash-recovery contract of the persisted stores: the two-rename swap
  * keeps data readable at every crash point, and a half-applied corpus
  * admission is detectable (validate) and repairable (repair).
  */
class StoreRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("legacy migration crash window: read falls back to path__old; " +
    "generational crash between write and marker flip serves the previous " +
    "generation; repair drops the dead generation") {
    val dir = Files.createTempDirectory("graft-swap").toString
    val path = s"$dir/t"
    // legacy table -> first swapIn migrates it to gen-1
    Seq(1, 2, 3).toDF("v").write.parquet(path)
    StoreCompaction.swapIn(spark, path, Seq(4, 5).toDF("v"))
    assert(StoreCompaction.resolve(spark, path).contains("/gen-"),
      "first swap must install the generational layout")
    assert(StoreCompaction.read(spark, path).as[Int].collect().sorted
      .toSeq == Seq(4, 5))
    // simulate the MIGRATION crash window on a fresh legacy table: legacy
    // displaced to __old, gen dir never installed
    val path2 = s"$dir/t2"
    Seq(7, 8).toDF("v").write.parquet(path2)
    assert(fs.rename(new Path(path2), new Path(path2 + "__old")))
    assert(StoreCompaction.resolve(spark, path2) == path2 + "__old")
    assert(StoreCompaction.read(spark, path2).as[Int].collect().sorted
      .toSeq == Seq(7, 8))
    // the next swap starts from the recovered data and heals the layout
    StoreCompaction.rewrite(spark, path2)(_.where(col("v") > 7))
    assert(StoreCompaction.read(spark, path2).as[Int].collect()
      .toSeq == Seq(8))
    assert(!fs.exists(new Path(path2 + "__old")))

    // generational crash window: a newer generation written but never
    // marker-flipped is invisible to readers and removed by repair()
    val live = StoreCompaction.resolve(spark, path)
    val dead = s"$path/gen-00000099"
    Seq(42).toDF("v").write.parquet(dead)
    assert(StoreCompaction.resolve(spark, path) == live,
      "an uncommitted generation must never resolve")
    assert(StoreCompaction.read(spark, path).as[Int].collect().sorted
      .toSeq == Seq(4, 5))
    StoreCompaction.repair(spark, path)
    assert(!fs.exists(new Path(dead)), "repair must drop the dead generation")
    assert(StoreCompaction.read(spark, path).as[Int].collect().sorted
      .toSeq == Seq(4, 5))

    // grace window: a swapped-out generation survives the next swap
    // (an in-flight reader's files are never deleted by the swap that
    // supersedes them), then retires once past BOTH the count and time
    // bounds (time grace zeroed here to pin the count bound alone)
    val genBefore = StoreCompaction.resolve(spark, path)
    StoreCompaction.rewrite(spark, path)(_.where(col("v") === 5))
    assert(fs.exists(new Path(genBefore)),
      "the superseded generation must survive the next swap (grace window)")
    val saved = StoreCompaction.GraceMs
    try {
      StoreCompaction.GraceMs = 0L
      StoreCompaction.rewrite(spark, path)(identity)
      assert(!fs.exists(new Path(genBefore)),
        "a generation beyond the grace window must be retired")
    } finally StoreCompaction.GraceMs = saved
    assert(StoreCompaction.read(spark, path).as[Int].collect()
      .toSeq == Seq(5))
  }

  test("swapIn crash before any rename: read falls back to __compacting") {
    val dir = Files.createTempDirectory("graft-swap2").toString
    val path = s"$dir/t"
    // a completed write that never got swapped (crash after write): only
    // the temp dir exists
    Seq(7, 8).toDF("v").write.parquet(path + "__compacting")
    assert(StoreCompaction.resolve(spark, path) == path + "__compacting")
    assert(StoreCompaction.read(spark, path).as[Int].collect().sorted
      .toSeq == Seq(7, 8))
  }

  test("BM25 index crash between postings and doclens appends: the union " +
    "replay guard skips the batch, validate flags it, repair reconstructs " +
    "doclens exactly from postings") {
    val dir = Files.createTempDirectory("graft-bm25-repair").toString + "/idx"
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val first = docs.where(col("doc_id") % 2 === 0)
    val late = docs.where(col("doc_id") % 2 =!= 0)
    val st = SearchIndexStore.build(spark, dir, first, "doc_id", "text")

    // simulate append's crash window: the batch's postings land, the
    // doclens append and meta swap never run
    val base = SearchIndexStore.tokenized(late, "doc_id", "text")
    SearchIndexStore.postingsOf(base)
      .write.mode("append")
      .parquet(StoreCompaction.appendTarget(spark, s"$dir/postings"))
    spark.catalog.refreshByPath(
      StoreCompaction.appendTarget(spark, s"$dir/postings"))
    assert(!st.validate(), "orphaned postings must fail validation")

    // the replay guard key set covers the half-landed docs, so a replayed
    // batch anti-joined against it admits NOTHING (no tf inflation)
    val replayFresh = late.join(
      st.admittedDocIds.select(col("doc_id")), Seq("doc_id"), "left_anti")
    assert(replayFresh.isEmpty,
      "half-landed batch must be recognized by the union guard")

    st.repair()
    assert(st.validate(), "repair must restore consistency")

    // repaired index scores identically to one built from ALL docs at once
    val full = SearchIndexStore.build(spark,
      Files.createTempDirectory("graft-bm25-full").toString + "/idx",
      docs, "doc_id", "text")
    val terms = Seq("spark", "join", "window", "fast")
    assert(st.topK(terms, 10).collect().toSeq ==
      full.topK(terms, 10).collect().toSeq,
      "repaired index must equal a from-scratch build")
  }

  test("corpus half-applied admission: validate flags it, repair rebuilds " +
    "the manifest from the shards") {
    val dir = Files.createTempDirectory("graft-corpus-repair").toString
    val docs = (0L until 40L).map(i => (i, s"doc $i body words")).toDF("doc_id", "text")
    CorpusStore.write(spark, dir, docs, "doc_id", "text", nShards = 4)
    assert(CorpusStore.validate(spark, dir, "doc_id", "text") == 0L)

    // simulate append's crash window: the batch's rows land in the shards
    // but the manifest merge never runs
    val batch = (40L until 55L).map(i => (i, s"late doc $i")).toDF("doc_id", "text")
    val shard = (graft.functions.TextFunctions.charFold(col("doc_id")
      .cast("string")) % 4).cast("int")
    batch.withColumn("shard", shard)
      .repartition(col("shard")).sortWithinPartitions(col("doc_id"))
      .write.mode("append").partitionBy("shard")
      .parquet(StoreCompaction.appendTarget(spark, s"$dir/docs"))
    spark.catalog.refreshByPath(
      StoreCompaction.appendTarget(spark, s"$dir/docs"))
    assert(CorpusStore.validate(spark, dir, "doc_id", "text") > 0L,
      "half-applied admission must be detected")

    // repair: the data is the source of truth
    val repaired = CorpusStore.repair(spark, dir, "text")
    assert(CorpusStore.validate(spark, dir, "doc_id", "text") == 0L)
    assert(repaired.agg(sum("n_docs")).head().getLong(0) == 55L)
  }
}
