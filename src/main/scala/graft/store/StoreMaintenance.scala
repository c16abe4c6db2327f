package graft.store

import java.util.concurrent.ConcurrentHashMap

/** Background compaction service for the persisted stores — the round-13
  * answer to "inline auto-compaction at scale": the admission-time trigger
  * ([[StoreCompaction.maybeAutoCompact]]) keeps a long-running ingest loop
  * healthy without operator intervention, but it runs the compact INLINE in
  * whichever admission crosses the file threshold — a corpus-linear rewrite
  * (hours at 100 TB) injected into one unlucky daily batch. With a store
  * REGISTERED here and the loop live, admissions skip the inline rewrite
  * entirely (they only append) and the loop's own thread pays the
  * compaction on its next tick; the inline path remains the fallback
  * whenever no loop is running, so an unattended ingest job is never worse
  * off than round 12.
  *
  * Serialization: the loop's compact and the store's admissions both hold
  * the store's [[lockFor]] monitor, so a compaction never interleaves with
  * an append's read-then-write (lost-update hazard: an append landing in
  * generation G after the compact has read G would be dropped by the
  * rewrite into G+1). JVM-local locking matches the stores' single-writer
  * contract — one driver owns a store's mutations; multi-driver
  * deployments serialize at the serving layer, unchanged. Readers need no
  * lock at all: the generational layout ([[StoreCompaction.swapIn]]) keeps
  * a compaction invisible to them.
  *
  * Reference analog: the reference runs index maintenance on its job
  * dispatcher rather than in request handlers
  * (crates/workspace-manager queue/dispatch.rs) — same separation applied
  * to admission vs rewrite.
  */
object StoreMaintenance {

  private final case class Registration(table: String, threshold: Int,
                                        label: String, lockKey: String,
                                        compact: () => Unit)

  /** Normalized table path → registration. */
  private val reg = new ConcurrentHashMap[String, Registration]()

  /** Per-store mutation monitors, keyed by normalized dir. */
  private val locks = new ConcurrentHashMap[String, Object]()

  @volatile private var loop
      : Option[java.util.concurrent.ScheduledExecutorService] = None

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Public face of [[StoreCompaction.AutoCompactFiles]] for callers
    * outside the store package registering maintenance thresholds.
    */
  val DefaultThreshold: Int = StoreCompaction.AutoCompactFiles

  /** The mutation monitor for a store dir — admissions and maintenance
    * compactions synchronize on this (see class doc).
    */
  def lockFor(dir: String): Object =
    locks.computeIfAbsent(normalize(dir), _ => new Object)

  /** Register a store table for background compaction: when `table`
    * exceeds `threshold` data files at a tick, `compact` runs on the
    * maintenance thread under `lockFor(lockDir)`. Re-registering a table
    * replaces its registration (idempotent for serving restarts).
    */
  def register(table: String, threshold: Int, label: String,
               lockDir: String)(compact: => Unit): Unit = {
    reg.put(normalize(table),
      Registration(table, threshold, label, normalize(lockDir),
        () => compact))
    ()
  }

  def deregister(table: String): Unit = { reg.remove(normalize(table)); () }

  /** True when an admission for `table` should SKIP its inline
    * auto-compact: a registration exists and the loop is live to honor
    * it. Checked by [[StoreCompaction.maybeAutoCompact]] on every
    * admission — if the loop was stopped (serving shutdown mid-ingest),
    * admissions transparently fall back to the inline path.
    */
  def delegated(table: String): Boolean =
    loop.isDefined && reg.containsKey(normalize(table))

  /** One maintenance pass over every registration (the loop's tick, and
    * the deterministic test face): compact each table past its threshold,
    * serialized against that store's admissions. Returns the labels that
    * compacted. Per-store failures are logged and skipped — one corrupt
    * store must not starve the rest of the fleet's maintenance.
    */
  def runOnce(spark: org.apache.spark.sql.SparkSession): Seq[String] = {
    val log = org.slf4j.LoggerFactory.getLogger(StoreMaintenance.getClass)
    import scala.jdk.CollectionConverters._
    reg.values.asScala.toSeq.sortBy(_.table).flatMap { r =>
      try {
        val n = StoreCompaction.dataFileCount(spark, r.table)
        if (n <= r.threshold) None
        else locks.computeIfAbsent(r.lockKey, _ => new Object).synchronized {
          log.info(s"${r.label}: maintenance compaction at $n data files " +
            s"(> ${r.threshold}) under ${r.table}")
          r.compact()
          Some(r.label)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.warn(s"${r.label}: maintenance compaction failed for " +
            s"${r.table}", e)
          None
      }
    }
  }

  /** Start the background loop (daemon thread, one tick every
    * `intervalMs`). Idempotent; [[stop]] to shut down.
    */
  def start(spark: org.apache.spark.sql.SparkSession,
            intervalMs: Long = 60_000L): Unit = synchronized {
    if (loop.isEmpty) {
      val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
        (r: Runnable) => {
          val t = new Thread(r, "graft-store-maintenance")
          t.setDaemon(true); t
        })
      ex.scheduleWithFixedDelay(() => { runOnce(spark); () },
        intervalMs, intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      loop = Some(ex)
    }
  }

  def stop(): Unit = synchronized {
    loop.foreach(_.shutdownNow())
    loop = None
  }
}
