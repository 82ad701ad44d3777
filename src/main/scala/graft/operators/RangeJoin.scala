package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Binned interval (range) join — join each point row to every interval row
 * with the same key and `start <= point <= end` (inclusive), WITHOUT the
 * cartesian/broadcast-nested-loop plan Spark falls into for a raw range
 * predicate: both sides are mapped onto fixed-width bins of the point
 * domain (intervals explode to every bin they overlap, points to their one
 * bin), the join runs as an ordinary shuffled EQUI-join on (keys, bin), and
 * the exact range predicate filters inside the same stage.
 *
 * A qualifying (point, interval) pair meets in EXACTLY one bin — the
 * point's — so no pair-dedup pass is needed. Cost: interval replication is
 * `duration/binWidth + 1` rows per interval; pick `binWidth` near the
 * typical interval length so replication stays O(1) while bins stay
 * selective. The bin key compounds with the caller's equi-keys, so a
 * temporally hot bin still spreads across keys.
 *
 * Point and interval column sets must be disjoint apart from `keys`
 * (standard join-column hygiene; the bin column is internal).
 */
object RangeJoin {

  def binnedIntervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binnedIntervalJoin: binWidth must be positive")
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val pt = points.withColumn("_bin",
      floor(col(ptCol) / binWidth).cast("long"))
    pt.join(iv, keys :+ "_bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }
}
