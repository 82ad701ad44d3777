package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Basket, Caches, Graph}

/** Dev-only Borůvka round-count profiler (not part of the driver
  * contract): measures, per SF, which round first selects zero edges —
  * the fixpoint the wired `rounds` constant must cover (+1 idempotent
  * margin, the corenum/MIS contract). */
object MstProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfs = sys.env.getOrElse("SPARK_GRAFT_SFS", "0.001,0.01,0.1")
      .split(",").toSeq
    val maxRounds = sys.env.getOrElse("SPARK_GRAFT_MST_ROUNDS", "10").toInt
    for (sf <- sfs) {
      val dir = s"/root/testdata/sf$sf"
      val pairs = Basket.pairCounts(
          Tables.lineitem(spark, dir), basket = "l_orderkey", item = "l_partkey")
        .filter(col("cnt") >= 2)
        .select(col("item_a").as("a"), col("item_b").as("b"),
          (lit(11L) - least(col("cnt"), lit(10L))).as("w"))
      val t0 = System.nanoTime()
      val mst = Graph.boruvkaMst(pairs, rounds = maxRounds, loopParts = 8)
      val byRound = mst.groupBy("round").agg(count(lit(1)).as("n"))
        .orderBy("round").collect()
      val total = mst.agg(count(lit(1)), sum("w")).collect()(0)
      println(f"[mst] sf=$sf wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"edges=${total.getLong(0)} weight=${total.getLong(1)} " +
        byRound.map(r => s"r${r.getLong(0)}:${r.getLong(1)}").mkString(" "))
      Caches.releaseAll()
    }
    spark.stop()
  }
}
