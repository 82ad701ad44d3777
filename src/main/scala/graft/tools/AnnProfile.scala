package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions
import graft.sources.Tables

/**
 * Dev-only ANN stage profiler (same spirit as [[DedupProfile]]): times the
 * pieces of the stress-bench LSH path in isolation to attribute its cost —
 * corpus scan, signature computation, banding, the bucket join, and the
 * top-k tail — against brute force. Not part of the query surface.
 *
 * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.AnnProfile"
 */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dupN(n: Int)(df: DataFrame, idCol: String, shift: Long): DataFrame =
      (0 until n).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i * shift))).reduce(_ unionAll _)
    val emb100 = dupN(100)(Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding"), "vec_id", 10000000L)
    val annQ = emb100.filter(col("vec_id") < 100)

    def time(name: String)(mk: => DataFrame): Unit = {
      // warm once, then median-of-3
      val runs = (0 until 4).map { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.drop(1)
      println(f"[annprof] $name%-40s ${runs.sorted.apply(1)}%.2f s  (${runs.map(r => f"$r%.2f").mkString("/")})")
    }

    time("scan_union100")(emb100)
    time("scan_union100_twice")(emb100.unionAll(emb100))
    val embCached = emb100.persist()
    embCached.write.format("noop").mode("overwrite").save() // materialize
    def timeKeep(name: String)(mk: => DataFrame): Unit = {
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.drop(1)
      println(f"[annprof] $name%-40s ${runs.sorted.apply(1)}%.2f s  (${runs.map(r => f"$r%.2f").mkString("/")})")
    }
    timeKeep("scan_cached")(embCached)
    timeKeep("lsh_full_cached")(Similarity.lshTopK(
      embCached.filter(col("vec_id") < 100), embCached, k = 5, nBits = 32, bands = 4))
    timeKeep("brute_full_cached")(Similarity.bruteForceTopK(
      embCached.filter(col("vec_id") < 100), embCached, k = 5))
    embCached.unpersist()
    time("signatures_only")(emb100.select(col("vec_id"),
      VectorFunctions.hyperplaneSignature(col("embedding"), 32, 42L, 64).as("sig")))
    time("banded_no_emb")(emb100.select(col("vec_id"),
        VectorFunctions.hyperplaneSignature(col("embedding"), 32, 42L, 64).as("sig"))
      .select(col("vec_id"), VectorFunctions.lshBands(col("sig"), 4, 8)
        .as(Seq("band", "band_val"))))
    time("banded_with_emb")(emb100.select(col("vec_id"), col("embedding"),
        VectorFunctions.hyperplaneSignature(col("embedding"), 32, 42L, 64).as("sig"))
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.lshBands(col("sig"), 4, 8).as(Seq("band", "band_val"))))
    time("lsh_full")(Similarity.lshTopK(annQ, emb100, k = 5, nBits = 32, bands = 4))
    time("brute_full")(Similarity.bruteForceTopK(annQ, emb100, k = 5))
    // candidate volume for reference
    val nCand = {
      def banded(df: DataFrame, idAs: String) =
        df.select(col("vec_id").as(idAs),
            VectorFunctions.hyperplaneSignature(col("embedding"), 32, 42L, 64).as("sig"))
          .select(col(idAs), VectorFunctions.lshBands(col("sig"), 4, 8)
            .as(Seq("band", "band_val")))
      banded(emb100, "neighbor_id")
        .join(broadcast(banded(annQ, "query_id")), Seq("band", "band_val"))
        .count()
    }
    println(s"[annprof] candidate rows through the bucket join: $nCand")
    spark.stop()
  }
}
