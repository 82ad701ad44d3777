package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (plans/rNN/<query>_{before,after}
  * .txt). Usage:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ExplainDump \
  *     /root/testdata/sf0.1 /root/repo/plans/r15 _before q1,q2"
  *
  * Args: sfDir outDir suffix queryCsv (queryCsv = "all" dumps everything).
  * Uses the exact Bench session config so the dumped plan is the plan the
  * bench times (same shuffle partitions, same extensions). The dump is the
  * ANALYZED static plan (`AdaptiveSparkPlan isFinalPlan=false`) — the
  * pre-execution shape: Exchange count, join strategy, PushedFilters.
  * Queries whose builders run eager driver-side work (checkpoint leaves)
  * still execute that part, so the dump can take seconds per query. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length != 4) {
      System.err.println(
        "usage: ExplainDump <sfDir> <outDir> <suffix> <queryCsv|all>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, qcsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val all = graft.SparkEntry.queries
    val names =
      if (qcsv == "all") all.keys.toSeq.sorted
      else qcsv.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    names.foreach { n =>
      val fn = all.getOrElse(n, sys.error(s"unknown query: $n"))
      System.err.println(s"[explain] $n")
      val txt =
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        } catch { case e: Throwable => s"ERROR: ${e}" }
      graft.operators.Caches.releaseAll()
      spark.catalog.clearCache()
      Files.write(Paths.get(outDir, s"$n$suffix.txt"),
        txt.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    spark.stop()
  }
}
