package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, UnknownPartitioning}
import org.apache.spark.sql.functions._

/**
 * Pins the checkpoint-layout claim (`Caches.checkpointTrackedLayout` →
 * `DatasetBridge.relabelCheckpointLayout`) — the r14 optimizer fix whose
 * whole value rests on two properties that were previously unpinned:
 *
 *  1. the claim FIRES on the layout the helper itself builds (if a Spark
 *     upgrade or a refactor stops the relabel from matching, every
 *     iterative operator silently re-pays an |E| exchange per round — a
 *     perf cliff with no correctness signal), and
 *  2. the claim is DECLINED whenever the pre-checkpoint plan does not end
 *     in exactly the announced repartition(+sort) — a false claim silently
 *     mis-joins, so the guard must fail CLOSED.
 */
class CheckpointLayoutSpec extends SparkSpecBase {
  import org.apache.spark.sql.graftbridge.DatasetBridge

  private def df() = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
  }

  private def leafOf(d: org.apache.spark.sql.DataFrame): LogicalRDD =
    d.queryExecution.analyzed match {
      case lr: LogicalRDD => lr
      case p => fail(s"expected a checkpoint leaf, got ${p.getClass}")
    }

  test("checkpointTrackedLayout announces HashPartitioning + ordering on the leaf") {
    try {
      val out = Caches.checkpointTrackedLayout(df(), Seq("k"), Seq("k"))
      val lr = leafOf(out)
      lr.outputPartitioning match {
        case hp: HashPartitioning =>
          assert(hp.expressions.map(_.asInstanceOf[
            org.apache.spark.sql.catalyst.expressions.Attribute].name) == Seq("k"))
          assert(hp.numPartitions ==
            spark.conf.get("spark.sql.shuffle.partitions").toInt)
        case other => fail(s"claim did not fire: leaf partitioning is $other")
      }
      assert(lr.outputOrdering.map(_.child.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Attribute].name) == Seq("k"))
      // the claimed frame must still be correct: joining on k equals the
      // unclaimed frame's rows
      assert(out.groupBy("k").count().collect().map(r => (r.getLong(0),
        r.getLong(1))).sortBy(_._1).toSeq ==
        df().groupBy("k").count().collect().map(r => (r.getLong(0),
          r.getLong(1))).sortBy(_._1).toSeq)
    } finally Caches.releaseAll()
  }

  test("sort-free layout claim fires with empty outputOrdering") {
    try {
      val out = Caches.checkpointTrackedLayout(df(), Seq("k"), Nil)
      val lr = leafOf(out)
      assert(lr.outputPartitioning.isInstanceOf[HashPartitioning])
      assert(lr.outputOrdering.isEmpty)
    } finally Caches.releaseAll()
  }

  test("a claim whose origin plan does not match is declined (fails closed)") {
    try {
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      // origin laid out by k, but the claim says v: must decline
      val laid = df().repartition(n, col("k")).sortWithinPartitions("k")
      val cp = laid.localCheckpoint()
      val out = DatasetBridge.relabelCheckpointLayout(cp, laid,
        Seq("v"), Seq("v"), n)
      assert(leafOf(out).outputPartitioning.isInstanceOf[UnknownPartitioning],
        "reordered-claim must be declined, not announced")
      // and a wrong partition count must decline too
      val out2 = DatasetBridge.relabelCheckpointLayout(cp, laid,
        Seq("k"), Seq("k"), n + 1)
      assert(leafOf(out2).outputPartitioning.isInstanceOf[UnknownPartitioning])
      // the honest claim on the same frames still fires
      val out3 = DatasetBridge.relabelCheckpointLayout(cp, laid,
        Seq("k"), Seq("k"), n)
      assert(leafOf(out3).outputPartitioning.isInstanceOf[HashPartitioning])
      cp.unpersist(true)
    } finally Caches.releaseAll()
  }

  test("an origin missing the sort cannot claim one") {
    try {
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val laid = df().repartition(n, col("k")) // no sortWithinPartitions
      val cp = laid.localCheckpoint()
      val out = DatasetBridge.relabelCheckpointLayout(cp, laid,
        Seq("k"), Seq("k"), n)
      assert(leafOf(out).outputPartitioning.isInstanceOf[UnknownPartitioning],
        "sort claim without a sort in the origin must be declined")
      // sort-free claim on the same origin is honest and fires
      val out2 = DatasetBridge.relabelCheckpointLayout(cp, laid,
        Seq("k"), Nil, n)
      assert(leafOf(out2).outputPartitioning.isInstanceOf[HashPartitioning])
      cp.unpersist(true)
    } finally Caches.releaseAll()
  }
}
