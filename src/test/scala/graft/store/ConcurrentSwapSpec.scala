package graft.store

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reader-vs-swap race under the GENERATIONAL store layout. Round 12's
  * contract limit — a swap COMPLETION deletes the files any mid-flight
  * scan planned against, so continuous back-to-back swaps could exhaust
  * any bounded retry — is retired by [[StoreCompaction.swapIn]]'s MVCC
  * layout: a new generation is published by one marker create, and a
  * superseded generation's files survive KeepGenerations further swaps
  * (the grace window), so a reader's whole execution runs against a
  * directory no writer mutates. The spec drives the EXACT workload the
  * old contract excluded — a ZERO-GAP swap loop — against a reader with
  * NO retry wrapper at all, and requires zero failed reads and zero torn
  * reads.
  */
class ConcurrentSwapSpec extends SparkSpec {

  test("a zero-gap swapIn loop against an unguarded reader: zero failed " +
    "reads, zero torn reads, no retries needed (generational layout)") {
    val dir = Files.createTempDirectory("graft-race").toString + "/t"
    def gen(g: Int) = spark.range(100)
      .select(col("id"), lit(g).as("gen"))
    gen(0).write.parquet(dir)
    // install the generational layout up front: the one-time legacy
    // migration (rename window) is covered by resolve's fallback chain +
    // withSwapRetry and is not what this spec pins
    StoreCompaction.swapIn(spark, dir, gen(1))
    assert(StoreCompaction.resolve(spark, dir).contains("/gen-"))
    val stop = new AtomicBoolean(false)
    val reads = new AtomicLong(0L)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          // deliberately UNGUARDED: no withSwapRetry, no read-level
          // retry should ever fire — the resolved generation dir is
          // immutable for the grace window
          val r = StoreCompaction.read(spark, dir)
            .agg(count(lit(1)).as("n"), countDistinct("gen").as("g"))
            .head()
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
      // ZERO-GAP: the exact cadence the round-12 two-rename contract
      // documented as able to exhaust any bounded retry count
      for (g <- 2 to 16) StoreCompaction.swapIn(spark, dir, gen(g))
    } finally {
      stop.set(true); reader.join()
    }
    assert(reads.get() > 0, "reader never completed a read")
    assert(bad.isEmpty,
      s"race violations (${bad.size}): ${bad.toArray.take(3).mkString("; ")}")
    assert(StoreCompaction.read(spark, dir)
      .agg(max(col("gen"))).head().getInt(0) == 16)
  }

  test("generation retirement bookkeeping: superseded generations are " +
    "reclaimed once past BOTH the count and the time grace") {
    val dir = Files.createTempDirectory("graft-retire").toString + "/t"
    def gen(g: Int) = spark.range(10)
      .select(col("id"), lit(g).as("gen"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def genDirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
      .map(_.getPath.getName).sorted.toSeq
    val saved = StoreCompaction.GraceMs
    try {
      // time grace active: a zero-gap burst retires nothing (every
      // superseded generation is younger than the grace), so transient
      // disk is swap-rate x GraceMs — and a slow reader keeps its files
      StoreCompaction.swapIn(spark, dir, gen(1))
      for (g <- 2 to 5) StoreCompaction.swapIn(spark, dir, gen(g))
      assert(genDirs.size == 5,
        s"inside the grace window nothing retires: $genDirs")
      // grace elapsed (simulated): the next swap reclaims down to the
      // KeepGenerations bound — steady-state disk is K+1 copies
      StoreCompaction.GraceMs = 0L
      StoreCompaction.swapIn(spark, dir, gen(6))
      assert(genDirs.size == StoreCompaction.KeepGenerations,
        s"past the grace window the count bound applies: $genDirs")
      assert(StoreCompaction.read(spark, dir)
        .agg(max(col("gen"))).head().getInt(0) == 6)
    } finally StoreCompaction.GraceMs = saved
  }
}
