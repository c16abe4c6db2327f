package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal cached intermediates, so long-lived
  * sessions can drop them once the query that needed them completes —
  * and so STORES can drop exactly the fragments reading their files
  * before mutating them.
  *
  * Why this exists: operators like the MinHash dedup faces cache a
  * shared intermediate (`shingle sets feed the band join and both
  * verification sides`) that must stay cached until the CALLER's action
  * finishes — the operator can never unpersist it itself. Left
  * registered forever, those entries are a correctness hazard in any
  * session that RERUNS a face after mutating a store the fragment read:
  * Spark's CacheManager SUBSTITUTES a registered fragment into any later
  * plan that matches it, and once its blocks are gone (evicted under
  * memory pressure, or freed by an RDD-level unpersist sweep — which
  * does NOT unregister the SQL-level entry) the substituted fragment
  * recomputes from its captured file listing. If the store was rebuilt
  * or compacted in between, that listing names deleted files — observed
  * at sf10 as a FAILED_READ_FILE abort on the curation-stream rerun —
  * or, for a swap that replaces rows, silently serves pre-swap data.
  * (`spark.catalog.refreshByPath` does NOT reliably repair the chain:
  * entries embed each other's InMemoryRelations physically, and a
  * refresh replaces only the registry entry, not the embedded
  * references. Measured: the rerun still aborted with per-mutation
  * refreshes in place; clearing the registry cured it.)
  *
  * Contract: operators register caches with [[cache]] (or [[register]]
  * for self-managed persists); each registration records the FILE PATHS
  * the fragment's analyzed plan reads. Two reclamation faces:
  *
  *   - [[drain]] — everything. Batch drivers (the streaming foreachBatch
  *     faces, composed-pipeline publish points) call it once their
  *     action has completed and before mutating stores their fragments
  *     read.
  *   - [[drainPath]] — only fragments whose plans read under (or above)
  *     a given directory. The persisted STORES call this in their
  *     mutating faces (build/append/retire/compact swap), which makes
  *     session-lifetime cache hygiene an engine property of the store
  *     rather than a per-caller discipline, WITHOUT evicting warm caches
  *     of unrelated operators (a global drain between bench queries
  *     measured a flat +25% on the cache-friendly gates).
  *
  * Draining unpersists at the DataFrame level, which removes the
  * CacheManager entry — an in-flight query that still references a
  * drained cache just recomputes (caching is an optimization, never a
  * correctness dependency).
  */
object TransientCache {

  private final case class Entry(paths: Option[Set[String]], seq: Long)

  /** Registered fragment → the normalized filesystem paths its analyzed
    * plan reads (None when path extraction failed — drained by ANY
    * drainPath, conservative) + a monotonic registration sequence (the
    * [[beginScope]]/[[drainScope]] lifecycle handle).
    */
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[DataFrame, Entry]()
  private val seqGen = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persist `df` (the Dataset.cache() level) and register it for the
    * next [[drain]]/[[drainPath]]/[[drainScope]].
    */
  def cache(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    register(df)
  }

  /** Register an ALREADY-persisted DataFrame for the next [[drain]] —
    * for operators that manage persist levels/lifetimes themselves (the
    * Unigram trainer's per-round vocab chain) but whose RETURNED cache
    * must still be reclaimable by draining drivers.
    */
  def register(df: DataFrame): DataFrame = {
    reg.put(df, Entry(sourcePaths(df), seqGen.incrementAndGet()))
    df
  }

  /** Open a lifecycle scope: everything registered AFTER this call is
    * dropped by the matching [[drainScope]]. Composed drivers (the batch
    * curation pipeline, the streaming foreachBatch faces) bracket their
    * run with this, so their operator-internal fragments end with the
    * run instead of lingering — a lingering fragment whose BLOCKS a later
    * RDD-level sweep frees is worse than no cache at all: the sweep
    * clears the buffer RDD's storage level without unregistering the SQL
    * entry, so every later matching plan substitutes a fragment that
    * recomputes ON EVERY USE and never re-materializes (measured: the
    * e2e rerun's new×seen stage at 9.2× its first-pass cost, three
    * consumers each recomputing the full upstream chain). Scoped
    * draining leaves caches registered by OTHER operators in the session
    * untouched.
    */
  def beginScope(): Long = seqGen.get()

  /** Drop every fragment registered after `mark` (see [[beginScope]]). */
  def drainScope(mark: Long): Unit = drainWhere(_.seq > mark)

  /** `.transientCache()` syntax for operator internals. */
  implicit final class Syntax(private val df: DataFrame) extends AnyVal {
    def transientCache(): DataFrame = cache(df)
  }

  /** Every file-source root path in `df`'s ANALYZED plan (pre-cache-
    * substitution, so nested registered fragments contribute their own
    * underlying file relations too), normalized to scheme-less URI paths.
    */
  private def sourcePaths(df: DataFrame): Option[Set[String]] =
    try {
      val fromV1 = df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Seq.empty[String]
          }
      }.flatten
      Some(fromV1.toSet)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def normalize(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toUri.getPath

  /** Unpersist every registered fragment whose plan reads a file under
    * `dir`, under a parent of `dir`, or at `dir` itself — called by the
    * stores' mutating faces with their own directory. Fragments whose
    * paths could not be determined are drained too (stale risk unknown
    * means assume stale). No-op for fragments over other stores.
    */
  def drainPath(dir: String): Unit = {
    val target = normalize(dir)
    drainWhere(_.paths match {
      case None => true
      case Some(paths) => paths.exists(p =>
        p == target || p.startsWith(target + "/") ||
          target.startsWith(p + "/"))
    })
  }

  /** Unpersist every registered cache (removing its CacheManager entry
    * — the part an RDD-level sweep misses).
    */
  def drain(): Unit = drainWhere(_ => true)

  private def drainWhere(pred: Entry => Boolean): Unit = {
    val it = reg.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (pred(e.getValue)) {
        // per-entry failures (a stopped session, a concurrent unpersist)
        // must not abort the sweep — but only NON-fatal ones: an OOM or
        // an interrupt here means the JVM/thread is dying and must
        // propagate (restoring the interrupt flag, which catch would
        // otherwise eat)
        try e.getKey.unpersist(false)
        catch {
          case _: InterruptedException =>
            Thread.currentThread().interrupt(); return
          case scala.util.control.NonFatal(_) => ()
        }
        it.remove()
      }
    }
  }
}
