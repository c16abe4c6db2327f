package graft.store

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reader-vs-swap race, exercised CONCURRENTLY (the prior specs drove
  * swap recovery sequentially): a reader thread querying a store table in
  * a loop while the writer thread runs live [[StoreCompaction.swapIn]]s
  * against it. The contract under test: every read that completes returns
  * a COMPLETE table — one generation, all its rows — never a torn mix or
  * a partial scan. Two mechanisms cooperate: resolve-time fallback +
  * single retry inside [[StoreCompaction.read]] (covers the listing), and
  * [[StoreCompaction.withSwapRetry]] around the reader's ACTION (covers a
  * scan planned pre-swap whose file opens land post-swap — the execution-
  * time window the lazy read face cannot guard). The race is REAL and
  * this spec exercises it — it surfaced two findings now baked into the
  * contract: a blind retry fails through the session's stale
  * FileStatusCache listing (withSwapRetry refreshes the path before each
  * re-plan), and a swap COMPLETION invalidates every mid-flight scan, so
  * bounded retries guarantee progress only when swaps are spaced wider
  * than one read (true of maintenance compactions; the spec paces its
  * swap loop accordingly — a zero-gap loop can exhaust ANY retry bound,
  * documented on withSwapRetry).
  */
class ConcurrentSwapSpec extends SparkSpec {

  test("a reader thread racing a live swapIn loop sees only complete " +
    "(old or new) tables, never torn or failed reads") {
    val dir = Files.createTempDirectory("graft-race").toString + "/t"
    def gen(g: Int) = spark.range(100)
      .select(col("id"), lit(g).as("gen"))
    gen(1).write.parquet(dir)
    // a reader losing the race logs its task failure at ERROR before the
    // retry recovers — expected here by construction, so keep the spec's
    // output quiet (level restored below)
    spark.sparkContext.setLogLevel("FATAL")
    val stop = new AtomicBoolean(false)
    val reads = new AtomicLong(0L)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val r = StoreCompaction.withSwapRetry(spark, dir) {
            StoreCompaction.read(spark, dir)
              .agg(count(lit(1)).as("n"), countDistinct("gen").as("g"))
              .head()
          }
          reads.incrementAndGet()
          if (r.getLong(0) != 100L || r.getLong(1) != 1L)
            bad.add(s"torn read: n=${r.getLong(0)} gens=${r.getLong(1)}")
        } catch {
          case e: Throwable => bad.add(s"reader failed: $e")
        }
      }
    })
    reader.start()
    try {
      for (g <- 2 to 20) {
        StoreCompaction.swapIn(spark, dir, gen(g))
        // serving cadence, not a tight loop: every swap completion
        // invalidates any mid-flight scan, so zero-gap swaps can exhaust
        // ANY bounded retry count (measured: 2-3 exhaustions per run at
        // 100 ms gaps) — while single-writer stores compact occasionally,
        // leaving retries a stable table to land on. The gap is sized to
        // one read's execution (~0.3-0.5 s here).
        Thread.sleep(750)
      }
    } finally {
      stop.set(true); reader.join()
      spark.sparkContext.setLogLevel("WARN")
    }
    assert(reads.get() > 0, "reader never completed a read")
    assert(bad.isEmpty,
      s"race violations (${bad.size}): ${bad.toArray.take(3).mkString("; ")}")
  }
}
