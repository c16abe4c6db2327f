package graft.store

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Maintenance-loop contract (round-13 item: move auto-compaction off the
  * admission path): with a store registered and the loop live, admissions
  * ONLY append — the corpus-linear rewrite runs on the maintenance thread
  * at its next tick — and when the loop stops, admissions transparently
  * fall back to the inline trigger, so an unattended ingest is never left
  * without compaction.
  */
class StoreMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(ids: Range) =
    ids.map(i => (i.toLong, s"document body number $i with words " +
      s"shared tail ${i % 7}")).toDF("doc_id", "text")

  test("registered store + live loop: admissions never pay the rewrite; " +
    "the tick compacts; stopping the loop restores the inline fallback") {
    val dir = Files.createTempDirectory("graft-maint").toString + "/idx"
    val st = DedupIndexStore.build(spark, dir, docsDf(0 until 40),
      "doc_id", "text", n = 3, numHashes = 16, bands = 8)
    val threshold = 8
    StoreMaintenance.register(s"$dir/bands", threshold,
      "DedupIndexStore", dir)(st.compact())
    StoreMaintenance.start(spark, intervalMs = 3_600_000L) // manual ticks
    try {
      // admissions past the threshold: with the loop live, the inline
      // trigger must NOT fire — the file count keeps growing
      var batch = 40
      while (StoreCompaction.dataFileCount(spark, s"$dir/bands")
          <= threshold) {
        st.append(docsDf(batch until batch + 10), "doc_id", "text",
          autoCompactFiles = threshold)
        batch += 10
      }
      val over = StoreCompaction.dataFileCount(spark, s"$dir/bands")
      assert(over > threshold,
        "admissions must leave the rewrite to the maintenance loop")
      st.append(docsDf(batch until batch + 10), "doc_id", "text",
        autoCompactFiles = threshold)
      batch += 10
      assert(StoreCompaction.dataFileCount(spark, s"$dir/bands") >= over,
        "a further admission with the loop live must still only append")

      // the tick pays the rewrite, serialized against admissions
      val compacted = StoreMaintenance.runOnce(spark)
      assert(compacted == Seq("DedupIndexStore"),
        s"the tick must compact the over-threshold store: $compacted")
      assert(StoreCompaction.dataFileCount(spark, s"$dir/bands")
        <= threshold, "the tick must restore the file bound")

      // content parity: the maintained store answers exactly like a
      // never-compacted fresh build over the same corpus
      val twinDir = Files.createTempDirectory("graft-maint2").toString + "/idx"
      DedupIndexStore.build(spark, twinDir, docsDf(0 until batch),
        "doc_id", "text", n = 3, numHashes = 16, bands = 8)
      val twin = new DedupIndexStore(twinDir, spark)
      assert(st.shingles.select("doc_id").as[Long].collect().sorted.toSeq ==
        twin.shingles.select("doc_id").as[Long].collect().sorted.toSeq)
      assert(st.bands.groupBy("band", "key").count().count() ==
        twin.bands.groupBy("band", "key").count().count())

      // loop stopped: the next over-threshold admission compacts INLINE
      StoreMaintenance.stop()
      var fallback = batch
      var didInline = false
      while (!didInline && fallback < batch + 200) {
        val before = StoreCompaction.dataFileCount(spark, s"$dir/bands")
        st.append(docsDf(fallback until fallback + 10), "doc_id", "text",
          autoCompactFiles = threshold)
        didInline =
          StoreCompaction.dataFileCount(spark, s"$dir/bands") < before
        fallback += 10
      }
      assert(didInline,
        "with the loop down, the inline trigger must take over")
    } finally {
      StoreMaintenance.stop()
      StoreMaintenance.deregister(s"$dir/bands")
    }
  }
}
