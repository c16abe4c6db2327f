package graft.store

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Admission-time auto-compaction: append-only use degrades the stores'
  * key-clustered-files property forever (each append lands its own file
  * set), and before this policy NOTHING in a production ingest loop ever
  * triggered compact() — a months-of-daily-appends index slowed until an
  * operator intervened. The policy: append faces check the table's data-
  * file count and run the store's own compact() inline past a threshold.
  * These specs pin (a) the trigger fires and bounds the file count, and
  * (b) compaction is invisible to results — the auto-compacted store and
  * a never-compacted twin serve identical live views and query answers.
  */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private def docRow(i: Long): (Long, String) =
    (i, (0 until 30).map(j => s"w${(i * 7 + j * 3) % 50} t$j").mkString(" "))

  test("dedup-index appends past the file threshold auto-compact: file " +
    "count bounded, live views and query answers equal a never-compacted " +
    "twin") {
    val dirA = Files.createTempDirectory("graft-ac-a").toString
    val dirM = Files.createTempDirectory("graft-ac-m").toString
    val seed = (1L to 4L).map(docRow).toDF("doc_id", "text")
    val auto = DedupIndexStore.build(spark, dirA, seed, "doc_id", "text")
    val manual = DedupIndexStore.build(spark, dirM, seed, "doc_id", "text")
    for (b <- 0 until 6) {
      val batch = ((10L + b * 4) to (13L + b * 4)).map(docRow)
        .toDF("doc_id", "text")
      // threshold 2: AQE coalesces each tiny append to ~1 file, so the
      // trigger must sit below the append count to engage at spec scale
      auto.append(batch, "doc_id", "text", autoCompactFiles = 2)
      manual.append(batch, "doc_id", "text", autoCompactFiles = 0)
    }
    val nAuto = StoreCompaction.dataFileCount(spark, s"$dirA/bands")
    val nManual = StoreCompaction.dataFileCount(spark, s"$dirM/bands")
    assert(nAuto < nManual,
      s"auto-compaction must bound file growth: auto=$nAuto manual=$nManual")
    // result equality at the table level: the live band and shingle views
    // are what every downstream query consumes
    def bandsOf(s: DedupIndexStore) = s.bands
      .select("doc_id", "band", "key").as[(Long, Int, String)].collect().toSet
    def shOf(s: DedupIndexStore) = s.shingles
      .select(col("doc_id"), col("sh").cast("string"))
      .as[(Long, String)].collect().toSet
    assert(bandsOf(auto) == bandsOf(manual), "band live views diverged")
    assert(shOf(auto) == shOf(manual), "shingle live views diverged")
    // ...and at the query level: an incremental probe answers identically
    val fresh = Seq((900L, docRow(10L)._2)).toDF("doc_id", "text")
    def pairs(s: DedupIndexStore) = graft.pipeline.Dedup
      .crossCorpusPairsIndexed(fresh, "doc_id", "text", s)
      .select("new_id", "seen_id").as[(Long, Long)].collect().toSet
    val pA = pairs(auto)
    assert(pA == pairs(manual) && pA.contains((900L, 10L)),
      s"query answers diverged or lost the true match: $pA")
  }

  test("corpus-store appends auto-compact without changing the live docs " +
    "or the manifest") {
    val dirA = Files.createTempDirectory("graft-ac-ca").toString
    val dirM = Files.createTempDirectory("graft-ac-cm").toString
    val seed = (1L to 4L).map(docRow).toDF("doc_id", "text")
    CorpusStore.write(spark, dirA, seed, "doc_id", "text", nShards = 4)
    CorpusStore.write(spark, dirM, seed, "doc_id", "text", nShards = 4)
    for (b <- 0 until 5) {
      val batch = ((10L + b * 3) to (12L + b * 3)).map(docRow)
        .toDF("doc_id", "text")
      CorpusStore.append(spark, dirA, batch, "doc_id", "text",
        autoCompactFiles = 6)
      CorpusStore.append(spark, dirM, batch, "doc_id", "text",
        autoCompactFiles = 0)
    }
    assert(StoreCompaction.dataFileCount(spark, s"$dirA/docs") <
      StoreCompaction.dataFileCount(spark, s"$dirM/docs"))
    def snap(d: String) = CorpusStore.docs(spark, d)
      .select("doc_id", "text", "shard").as[(Long, String, Int)]
      .collect().toSet
    assert(snap(dirA) == snap(dirM), "live docs diverged")
    assert(CorpusStore.manifest(spark, dirA).collect().toSet ==
      CorpusStore.manifest(spark, dirM).collect().toSet)
    assert(CorpusStore.validate(spark, dirA, "doc_id", "text") == 0L)
  }
}
