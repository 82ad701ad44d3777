package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/**
 * Bucketed-table co-located joins — the OTHER storage-layout scale lever
 * next to [[Layout]]'s Z-order clustering: pre-hash-partitioning both
 * sides of a recurring fact-fact join into the same bucket count makes
 * the join's Exchange disappear ENTIRELY (the on-disk bucket layout IS
 * the required partitioning), which at 100 TB converts every repeated
 * orders⋈lineitem into a shuffle-free zip of co-located buckets. The
 * tables are external (explicit path into a temp dir) so the shared test
 * session's warehouse is never touched; dropped + deleted in finally.
 */
class BucketingSpec extends SparkSpecBase {

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }

  test("co-bucketed fact-fact join plans ZERO exchanges; results match the plain join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketing").toFile
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join planner: broadcast would hide the exchange
      // question this spec exists to answer
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(spark, sf0001).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/orders_b").saveAsTable("graft_orders_b")
      Tables.lineitem(spark, sf0001).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/lineitem_b").saveAsTable("graft_lineitem_b")

      val bucketed = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))
      val p = bucketed.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p) // the whole point: no shuffle at all
      assert(p.contains("SelectedBucketsCount"), p)

      // same join over the raw parquet shuffles BOTH sides
      val plain = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))
      val pp = plain.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert("Exchange".r.findAllIn(pp).size >= 2, pp)

      // layout changes the plan, never the answer
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
      deleteRecursively(tmp)
    }
  }

  test("single-table bucket pruning: an equality predicate reads one bucket") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketing-prune").toFile
    // without a join demanding the bucket partitioning, the auto-bucketed-scan
    // heuristic falls back to a plain file scan — pin it on so the filter
    // goes through the bucket-pruning path this spec measures
    val prevAuto =
      spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      Tables.orders(spark, sf0001).write
        .bucketBy(8, "o_orderkey")
        .option("path", s"$tmp/orders_b").saveAsTable("graft_orders_prune")
      val one = spark.table("graft_orders_prune")
        .filter(col("o_orderkey") === 42L)
      val p = one.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // 1 of 8 buckets selected — the scan skips 7/8 of the table by layout
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.sql("DROP TABLE IF EXISTS graft_orders_prune")
      deleteRecursively(tmp)
    }
  }
}
