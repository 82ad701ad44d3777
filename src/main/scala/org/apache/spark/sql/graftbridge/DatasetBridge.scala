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
}
