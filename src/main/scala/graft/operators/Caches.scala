package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.Dataset

/**
 * Deterministic, targeted release of operator-internal caches.
 *
 * Several operators ([[Dedup]]'s signature/shingle-set tables above all)
 * persist an intermediate that their returned plan reads more than once —
 * the persist is load-bearing for the plan, so the operator cannot release
 * it before the caller has materialized the result. Every such persist is
 * registered here, and the caller's contract is:
 *
 * {{{
 *   val out = Dedup.minhashLsh(docs)        // plan; intermediates tracked
 *   out.write...                            // materialize
 *   Caches.releaseAll()                     // release graft's intermediates
 * }}}
 *
 * `releaseAll` unpersists exactly what graft tracked — unlike
 * `spark.catalog.clearCache()`, it cannot nuke caches an embedding
 * application owns, and unlike a blanket `getPersistentRDDs` sweep it
 * cannot touch RDDs it did not create. (Operators that can bound their own
 * cache lifetime — [[Dedup.duplicateClusters]]'s loop RDDs — release
 * internally via try/finally and never appear here.)
 *
 * Unpersisting an already-released dataset is a no-op, so calling
 * `releaseAll` alongside a legacy `clearCache()` sweep is safe.
 */
object Caches {
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` (Spark's default MEMORY_AND_DISK) and register it for the
    * next [[releaseAll]]. Internal: operators call this instead of a bare
    * `.persist()` for every cache whose lifetime the caller owns. */
  private[graft] def persistTracked[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    tracked.add(ds)
    ds
  }

  /** Unpersist every tracked dataset; returns how many were released.
    * Thread-safe; entries are drained, so a second call is a no-op. */
  def releaseAll(blocking: Boolean = false): Int = {
    var n = 0
    var ds = tracked.poll()
    while (ds != null) {
      ds.unpersist(blocking)
      n += 1
      ds = tracked.poll()
    }
    n
  }

  /** Number of currently tracked (not yet released) caches — test hook. */
  def trackedCount: Int = tracked.size()

  /** Run `body` and release every operator cache it tracked, success or
    * failure — the one-liner form of the caller contract:
    *
    * {{{
    *   Caches.scoped { Dedup.minhashLsh(docs).write.parquet(out) }
    * }}}
    *
    * `body` must MATERIALIZE what it builds (write/collect/count): a lazy
    * DataFrame returned out of the scope stays correct — Spark rebuilds
    * dropped cache partitions from lineage — but loses the cache benefit. */
  def scoped[A](body: => A): A =
    try body finally releaseAll()
}
