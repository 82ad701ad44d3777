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
  private val indexTracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` (Spark's default MEMORY_AND_DISK) and register it for the
    * next [[releaseAll]]. Internal: operators call this instead of a bare
    * `.persist()` for every cache whose lifetime the caller owns. */
  private[graft] def persistTracked[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    tracked.add(ds)
    ds
  }

  /** Eagerly materialize `ds` through `localCheckpoint` (executor-local,
    * lineage-truncating) and register it for the next [[releaseAll]] —
    * the QUERY-lifetime twin of the IVF tier's checkpoint generations.
    * Use over [[persistTracked]] when the plan consumes the intermediate
    * from MANY subtrees: a checkpoint is a leaf, so consumers cannot
    * re-derive it and the printed plan stays shallow, where a cache
    * entry is re-planned (and its cached derivation re-printed/re-walked)
    * at every reference. Eager: the derivation runs HERE, not at first
    * downstream action. */
  private[graft] def checkpointTracked[T](ds: Dataset[T]): Dataset[T] = {
    val cp = ds.localCheckpoint()
    tracked.add(cp)
    cp
  }

  /** [[checkpointTracked]] for frames whose value IS their layout — the
    * iterative operators' pre-partitioned edge bases. Lays `df` out as
    * `repartition(shufflePartitions, hashCols).sortWithinPartitions
    * (sortCols)`, checkpoints it, and RE-ANNOUNCES that layout on the
    * checkpoint leaf via [[org.apache.spark.sql.graftbridge.DatasetBridge
    * .relabelCheckpointLayout]] — because under AQE `localCheckpoint`
    * returns an `UnknownPartitioning(0)` leaf, silently discarding the
    * layout the loop paid a shuffle to build (every round then re-exchanges
    * the |E| base the design says never moves). The layout claim is true
    * by construction: this helper OWNS the repartition+sort it announces —
    * and the bridge re-verifies that against the plan it is handed (the
    * pre-checkpoint logical plan must actually end in that repartition(+
    * sort), or the claim is declined). Leaf stats are the MEASURED
    * BlockManager size of the backing RDD (session default only when the
    * storage info is not yet visible) — fixed, so they cannot compound
    * (see [[checkpointTrackedFreshStats]]). */
  private[graft] def checkpointTrackedLayout(
      df: org.apache.spark.sql.DataFrame, hashCols: Seq[String],
      sortCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val laid = df.repartition(n, hashCols.map(col): _*)
    val sorted =
      if (sortCols.nonEmpty) laid.sortWithinPartitions(sortCols.map(col): _*)
      else laid
    val cp = sorted.localCheckpoint()
    tracked.add(cp)
    org.apache.spark.sql.graftbridge.DatasetBridge
      .relabelCheckpointLayout(cp, sorted, hashCols, sortCols, n)
  }

  /** [[checkpointTracked]] for ITERATIVE-LOOP state frames: additionally
    * drops the origin statistics the checkpoint inherits from the plan it
    * truncated (via [[org.apache.spark.sql.graftbridge.DatasetBridge
    * .dropCheckpointStats]]). A loop that joins its own state twice per
    * round CUBES the size-only estimate each round, and each cap
    * re-exports the compounded BigInt as the next segment's leaf stats —
    * exponential digit growth that turns the optimizer into
    * million-digit BigInteger arithmetic (measured: the 20-round
    * core-number loop spent MINUTES in `multiplyToomCook3`; linear after
    * this). Loop caps want the checkpoint's TRUNCATION, not its stats
    * memory — AQE re-plans from real runtime sizes anyway. The tracked
    * entry is the checkpoint itself (same backing RDD), so the release
    * contract is unchanged. */
  private[graft] def checkpointTrackedFreshStats(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cp = df.localCheckpoint()
    tracked.add(cp)
    // measured (not merely dropped) stats: the r11 drop-to-default cured
    // the exponential compounding but set the leaf to Long.MaxValue,
    // which statically forbade broadcasting a ~1 MB loop-state frame —
    // every per-round join then planned sort-merge + exchange until AQE
    // rescued it one materialized shuffle too late. The checkpoint's
    // backing RDD is already materialized, so its BlockManager size is
    // the honest leaf estimate: fixed (cannot compound) and real (a
    // |V|-sized label frame broadcasts statically again).
    org.apache.spark.sql.graftbridge.DatasetBridge
      .withMeasuredCheckpointStats(cp)
  }

  /** Persist `ds` into the INDEX registry: caches whose lifetime is an
    * index object's (IVF assignments), which must SURVIVE the per-query
    * [[releaseAll]] drain — an ANN service probes one materialized
    * assignment across many query batches, each of which legitimately
    * drains the per-query registry. Tracked separately so (a) a leak in
    * the index lifecycle is still visible to hygiene tests via
    * [[trackedIndexCount]]/[[releaseAllIndexes]] instead of silently
    * bypassing all tracking (the round-8 state: three bare `.persist()`
    * calls invisible to PersistHygieneSpec), and (b) `releaseAll` can
    * keep its contract of never touching caches the caller still owns. */
  private[graft] def persistIndex[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    trackIndex(ds)
  }

  /** Register an ALREADY-persisted dataset (e.g. `localCheckpoint`, which
    * persists internally) in the index registry without re-persisting. */
  private[graft] def trackIndex[T](ds: Dataset[T]): Dataset[T] = {
    indexTracked.add(ds)
    ds
  }

  /** CacheManager unpersist PLUS any `localCheckpoint` backing RDDs in the
    * plan — `Dataset.unpersist()` alone cannot release a checkpoint's
    * BlockManager cache (it only talks to the CacheManager), so a
    * lineage-truncated index generation would otherwise leak its blocks. */
  private def unpersistDeep(ds: Dataset[_], blocking: Boolean): Unit = {
    ds.unpersist(blocking)
    org.apache.spark.sql.graftbridge.DatasetBridge.checkpointBackingRdds(ds)
      .foreach(_.unpersist(blocking))
  }

  /** Unpersist one index-registry cache and drop its registry entry.
    * No-op (returns false) if `ds` was not index-tracked. */
  private[graft] def releaseIndex(ds: Dataset[_],
      blocking: Boolean = false): Boolean = {
    val present = indexTracked.remove(ds)
    if (present) unpersistDeep(ds, blocking)
    present
  }

  /** Unpersist every index-registry cache — test/shutdown hook; returns
    * how many were released. Production callers release per-index via
    * `IvfIndex.release()`. */
  def releaseAllIndexes(blocking: Boolean = false): Int = {
    var n = 0
    var ds = indexTracked.poll()
    while (ds != null) {
      unpersistDeep(ds, blocking)
      n += 1
      ds = indexTracked.poll()
    }
    n
  }

  /** Number of currently tracked index-lifetime caches — test hook. */
  def trackedIndexCount: Int = indexTracked.size()

  /** Unpersist every tracked dataset; returns how many were released.
    * Thread-safe; entries are drained, so a second call is a no-op.
    * Deep: also releases `localCheckpoint` backing RDDs
    * ([[checkpointTracked]] entries), which `Dataset.unpersist` alone
    * cannot reach; a no-op for plain cached entries. */
  def releaseAll(blocking: Boolean = false): Int = {
    var n = 0
    var ds = tracked.poll()
    while (ds != null) {
      unpersistDeep(ds, blocking)
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
