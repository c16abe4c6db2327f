package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal cached intermediates, so long-lived
  * sessions can drop them once the query that needed them completes.
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
  * Contract: operators register caches with [[cache]]; batch drivers
  * (the streaming foreachBatch faces, Bench/Verify between queries)
  * call [[drain]] once their action has completed. Draining unpersists
  * at the DataFrame level, which removes the CacheManager entry — an
  * in-flight query that still references a drained cache just
  * recomputes (caching is an optimization, never a correctness
  * dependency).
  */
object TransientCache {

  private val reg = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist `df` (the Dataset.cache() level) and register it for the
    * next [[drain]].
    */
  def cache(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    reg.add(df)
    df
  }

  /** `.transientCache()` syntax for operator internals. */
  implicit final class Syntax(private val df: DataFrame) extends AnyVal {
    def transientCache(): DataFrame = cache(df)
  }

  /** Unpersist every registered cache (removing its CacheManager entry
    * — the part an RDD-level sweep misses).
    */
  def drain(): Unit = {
    val it = reg.iterator()
    while (it.hasNext) {
      try it.next().unpersist(false)
      catch { case _: Throwable => () }
      it.remove()
    }
  }
}
