package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Persisted incremental-triangle store: admissions maintain the exact
  * census batch by batch, replay is a no-op, and a half-applied admission
  * is detectable and repairable.
  */
class TriangleStoreSpec extends SparkSpec {
  import spark.implicits._

  // kind-tagged DEF_TO_DEF edge rows
  private def edgeDf(pairs: (Long, Long)*) =
    pairs.map { case (s, t) => ("DEF_TO_DEF", s, t) }
      .toDF("kind", "source_id", "target_id")

  test("admissions maintain the exact census; replay admits nothing") {
    val dir = Files.createTempDirectory("graft-tri").toString + "/s"
    // base graph: triangle 1-2-3 plus pendant 3-4 (reversed dup collapses)
    val st = TriangleStore.build(spark, dir,
      edgeDf((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 4L)))
    assert(st.stats == ((4L, 1L)))

    // batch 1: edge 2-4 closes triangle 2-3-4
    val (n1, d1) = st.admit(edgeDf((2L, 4L)))
    assert((n1, d1) == ((1L, 1L)))
    assert(st.stats == ((5L, 2L)))

    // batch 2: edge 1-4 closes 1-2-4 AND 1-3-4; a duplicate of a stored
    // edge rides along and must admit nothing
    val (n2, d2) = st.admit(edgeDf((1L, 4L), (3L, 1L)))
    assert((n2, d2) == ((1L, 2L)))
    assert(st.stats == ((6L, 4L)))

    // replay of batch 2 is a no-op (crash-replay contract)
    assert(st.admit(edgeDf((1L, 4L), (3L, 1L))) == ((0L, 0L)))
    assert(st.stats == ((6L, 4L)))
    assert(st.validate())

    // compaction preserves both tables' content
    st.compact()
    assert(st.validate())
  }

  test("half-applied admission: validate detects, repair re-censuses") {
    val dir = Files.createTempDirectory("graft-tri2").toString + "/s"
    val st = TriangleStore.build(spark, dir,
      edgeDf((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(st.stats == ((3L, 1L)))
    // simulate the crash window: edges of {2-4, 3-4} land, meta never swaps
    Seq((2L + (3L << 32), 4L + (3L << 32)), (3L + (3L << 32), 4L + (3L << 32)))
      .toDF("u", "v").write.mode("append")
      .parquet(StoreCompaction.appendTarget(spark, s"$dir/edges"))
    spark.catalog.refreshByPath(
      StoreCompaction.appendTarget(spark, s"$dir/edges"))
    assert(!st.validate(), "half-applied admission must be detected")
    st.repair()
    assert(st.validate())
    assert(st.stats == ((5L, 2L))) // 2-3-4 closed by the recovered edges
  }
}
