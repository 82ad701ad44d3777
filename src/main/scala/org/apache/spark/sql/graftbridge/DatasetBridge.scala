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
}
