package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Pins the checkpoint-GC contract behind the iterative DataFrame loops
  * (k-core peeling, label propagation, star contraction): superseded
  * per-round `localCheckpoint(true)` generations must actually leave the
  * block manager, because `Dataset.unpersist` is a CacheManager no-op for
  * checkpointed frames — the round-9 sf10 k-core run accumulated every
  * peel round's full 140M-edge frame and paid +29% in GC.
  */
class LocalCpSpec extends SparkSpec {

  private def checkpointRddIds(ds: org.apache.spark.sql.Dataset[_]): Seq[Int] =
    ds.queryExecution.analyzed.collectLeaves().collect {
      case lr: LogicalRDD => lr.rdd.id
    }

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("free() unpersists the RDD behind an eager local checkpoint") {
    import spark.implicits._
    val cp = (1 to 100).toDF("n").localCheckpoint(true)
    val ids = checkpointRddIds(cp)
    assert(ids.nonEmpty, "a localCheckpoint'd frame must expose a LogicalRDD leaf")
    assert(ids.forall(persistedIds.contains),
      "eager localCheckpoint must register persisted blocks")
    // the documented trap: Dataset.unpersist does NOT free them
    cp.unpersist(blocking = true)
    assert(ids.forall(persistedIds.contains),
      "Dataset.unpersist must be a no-op here (else LocalCp is redundant)")
    LocalCp.free(cp)
    assert(ids.forall(!persistedIds.contains(_)),
      "LocalCp.free must drop the checkpoint blocks")
  }

  test("free() reaches the checkpoint through derived projections") {
    import spark.implicits._
    val cp = (1 to 50).toDF("n").localCheckpoint(true)
    val derived = cp.select((col("n") * 2).as("m")).where(col("m") > 10)
    val ids = checkpointRddIds(derived)
    assert(ids == checkpointRddIds(cp))
    LocalCp.free(derived)
    assert(ids.forall(!persistedIds.contains(_)))
  }

  test("k-core peeling keeps a bounded checkpoint live set across rounds") {
    import spark.implicits._
    val before = persistedIds
    // a long peel chain: a path graph peels one layer per round at k=2
    // (endpoints drop, new endpoints drop, ...), forcing many rounds
    val path = (0L until 40L).sliding(2).map(p => (p(0), p(1))).toSeq
    val edges = path.toDF("source_id", "target_id")
      .withColumn("kind", lit("calls")).withColumn("type", lit("calls"))
    val core = graft.graph.GraphOps.kCore(edges, k = 2, maxRounds = 40)
    assert(core.count() == 0) // a path has no 2-core
    val leaked = persistedIds -- before
    assert(leaked.size <= 1,
      s"peeling must free superseded rounds; leaked RDD ids: $leaked")
  }

  test("star contraction frees superseded rounds and stays correct") {
    import spark.implicits._
    val before = persistedIds
    // two components: a chain 0-1-2-3 and a pair 10-11
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = graft.pipeline.Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 10L, 11L -> 10L))
    val leaked = persistedIds -- before
    // live tail: participants + final edges generation
    assert(leaked.size <= 2,
      s"star contraction must free superseded rounds; leaked: $leaked")
  }
}
