package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Bridge for Dataset internals the public API does not expose.
 *
 * `Dataset.localCheckpoint()` materializes into a persisted RDD wrapped in
 * a [[LogicalRDD]] leaf — a BlockManager cache that `Dataset.unpersist()`
 * (which only talks to the CacheManager) can never release. Any cache
 * registry that hands out lineage-truncated datasets needs to reach that
 * backing RDD to honor its own release contract; this collects the
 * checkpoint-backing RDDs of a plan so the caller can unpersist them.
 */
object DatasetBridge {
  /** The persisted RDDs backing any `localCheckpoint`/`checkpoint` leaves
    * in `ds`'s plan (empty for ordinary plans). */
  def checkpointBackingRdds(ds: Dataset[_]): Seq[RDD[_]] =
    ds.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }.toSeq

  /**
   * A copy of a just-checkpointed frame whose [[LogicalRDD]] leaf DROPS
   * the origin statistics `Dataset.localCheckpoint` copies over from the
   * plan it truncated (falling back to the session default size — the
   * same stats any other leaf without history gets). Partitioning,
   * ordering, and the backing RDD are preserved; only the inherited
   * stats go.
   *
   * Why this must exist: checkpoint-preserved stats COMPOUND through
   * iterative plans. Catalyst's size-only estimator MULTIPLIES child
   * sizes through joins, so a loop that joins its own state frame twice
   * per round cubes the estimate each round; with each cap's checkpoint
   * re-exporting the compounded BigInt as the next segment's leaf stats,
   * the estimate's DIGIT COUNT grows exponentially in rounds and the
   * optimizer ends up doing million-digit BigInteger arithmetic —
   * measured on the 20-round core-number loop as minutes of pure
   * `BigInteger.multiplyToomCook3` before this reset (rounds 17→21 each
   * DOUBLED the wall time; with the reset the loop is linear in rounds).
   * The trade is benign: these loop frames' compounded estimates were
   * astronomically wrong anyway (never broadcastable), and AQE re-plans
   * from REAL runtime sizes regardless.
   */
  def dropCheckpointStats(ds: Dataset[org.apache.spark.sql.Row])
      : Dataset[org.apache.spark.sql.Row] =
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = ds.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        org.apache.spark.sql.classic.Dataset.ofRows(
          session, lr.copy()(session, None, None))
      case _ => ds // not a bare checkpoint leaf — leave untouched
    }

  /**
   * Re-announce a just-`localCheckpoint`ed frame's PHYSICAL LAYOUT on its
   * [[LogicalRDD]] leaf: `HashPartitioning(hashCols, numPartitions)` plus
   * an ascending per-partition ordering on `sortCols`.
   *
   * Why this must exist: under AQE (the default), `Dataset.localCheckpoint`
   * builds its LogicalRDD from `AdaptiveSparkPlanExec`, whose
   * `outputPartitioning` is the LeafExecNode default `UnknownPartitioning(0)`
   * — so a frame laid out with `repartition(n, key).sortWithinPartitions`
   * comes back as a leaf that CLAIMS no layout at all, and every downstream
   * join/aggregate on the key re-exchanges (and re-sorts) the materialized
   * data. For graft's iterative operators, whose whole design is "checkpoint
   * the |E| edge base pre-partitioned by the per-round join key so only the
   * |V| state exchanges per round", the silent loss re-shuffled the edge
   * base EVERY ROUND (measured at sf0.1: a 1.5 M-edge Exchange per Louvain
   * round that the plans were designed not to pay).
   *
   * CALLER CONTRACT (correctness-critical — a false claim silently
   * mis-joins): the checkpointed plan must ACTUALLY end in
   * `repartition(numPartitions, hashCols).sortWithinPartitions(sortCols)`
   * (checkpoint partitions are the executed plan's partitions 1:1 and rows
   * are copied in order, so the physical layout IS the claim). The
   * contract is VERIFIED, not trusted: `origin` is the pre-checkpoint
   * frame, whose analyzed plan must end in exactly that
   * Sort(within-partitions, ascending `sortCols`) over
   * RepartitionByExpression(`hashCols`, `numPartitions`) — a caller that
   * reorders the repartition columns or drops the sort cannot make a
   * false claim; the claim is silently declined instead (frame returned
   * unannounced — merely slower, never wrong). Explicit-N repartition is
   * REPARTITION_BY_NUM, which AQE never coalesces — the count is
   * additionally verified against the backing RDD. Leaf statistics are
   * the MEASURED BlockManager size of the backing RDD
   * ([[withMeasuredCheckpointStats]]'s contract — fixed, honest,
   * broadcast-enabling), falling back to the session default when the
   * storage info is not yet visible.
   */
  def relabelCheckpointLayout(ds: Dataset[org.apache.spark.sql.Row],
      origin: Dataset[org.apache.spark.sql.Row],
      hashCols: Seq[String], sortCols: Seq[String],
      numPartitions: Int): Dataset[org.apache.spark.sql.Row] =
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD if lr.rdd.getNumPartitions == numPartitions &&
          originMatchesClaim(origin.queryExecution.analyzed, hashCols,
            sortCols, numPartitions) =>
        val session = ds.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val byName = lr.output.map(a => a.name -> a).toMap
        val part = org.apache.spark.sql.catalyst.plans.physical
          .HashPartitioning(hashCols.map(byName), numPartitions)
        val ord = sortCols.map(c =>
          org.apache.spark.sql.catalyst.expressions.SortOrder(
            byName(c), org.apache.spark.sql.catalyst.expressions.Ascending))
        org.apache.spark.sql.classic.Dataset.ofRows(
          session,
          lr.copy(outputPartitioning = part, outputOrdering = ord)(
            session, measuredStats(session, lr), None))
      case _ => ds // no checkpoint leaf / count or layout mismatch: no claim
    }

  /** Does `plan` end in Sort(within-partitions, asc `sortCols`) over
    * RepartitionByExpression(`hashCols`, `numPartitions`) — i.e. is the
    * layout claim literally the plan that was checkpointed? Column
    * matching is by attribute NAME (the claim columns are caller-supplied
    * names over the same frame). Anything unexpected → false (decline). */
  private def originMatchesClaim(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      hashCols: Seq[String], sortCols: Seq[String], n: Int): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.{RepartitionByExpression, Sort}
    def attrNames(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
        : Option[Seq[String]] = {
      val names = es.map { case a: Attribute => a.name; case _ => null }
      if (names.contains(null)) None else Some(names)
    }
    val (sortOk, inner) = plan match {
      case s: Sort if !s.global =>
        (s.order.forall(_.direction == Ascending) &&
          attrNames(s.order.map(_.child)).contains(sortCols), s.child)
      case p => (sortCols.isEmpty, p)
    }
    sortOk && (inner match {
      case r: RepartitionByExpression =>
        r.optNumPartitions.contains(n) &&
          attrNames(r.partitionExpressions).contains(hashCols)
      case _ => false
    })
  }

  /** The measured BlockManager size of a checkpoint leaf's backing RDD as
    * leaf [[Statistics]] — None (caller falls back to session default)
    * when the storage info is not yet visible. */
  private def measuredStats(
      session: org.apache.spark.sql.classic.SparkSession, lr: LogicalRDD)
      : Option[org.apache.spark.sql.catalyst.plans.logical.Statistics] =
    session.sparkContext.getRDDStorageInfo
      .find(_.id == lr.rdd.id)
      .map(i => i.memSize + i.diskSize)
      .filter(_ > 0L)
      .map(bytes => org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(bytes)))

  /**
   * Replace a just-checkpointed frame's leaf statistics with the REAL
   * MEASURED size of its (already materialized — `localCheckpoint` is
   * eager) backing RDD from the BlockManager's storage info.
   *
   * This supersedes [[dropCheckpointStats]]'s fall-back-to-default for
   * iterative loops on both of that fix's axes while adding a third:
   * (1) no compounding — the size is a fixed measured number, not a
   * product of upstream estimates, so a loop that joins its state twice
   * per round stays linear; (2) honest planning — the session-default
   * fallback is `Long.MaxValue`, which statically FORBIDS broadcasting a
   * 1 MB label frame and forces every per-round join through
   * sort-merge + exchange until AQE rescues it one materialized shuffle
   * too late (measured on the Louvain move loop: the |V| state paid an
   * exchange per join per round); (3) the in-memory object-size estimate
   * OVER-states serialized bytes, so a borderline frame errs toward not
   * broadcasting — the safe direction. Falls back to dropping stats when
   * the storage info is not yet visible.
   */
  def withMeasuredCheckpointStats(ds: Dataset[org.apache.spark.sql.Row])
      : Dataset[org.apache.spark.sql.Row] =
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = ds.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        org.apache.spark.sql.classic.Dataset.ofRows(
          session, lr.copy()(session, measuredStats(session, lr), None))
      case _ => ds
    }
}
