package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is forced with a
  * `noop`-format write — a full materialization of every output row through
  * the real plan — because `count()` would let Catalyst prune projections
  * and aggregate-count shortcuts would skip the actual work. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM + parquet footers once so per-query times measure the
    // plan, not first-touch classloading
    SparkEntry.queries("group_count")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    // SPARK_GRAFT_ONLY: comma-separated query-name filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      System.err.println(s"[bench] running $name")
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      // Release per-query persisted intermediates. clearCache() only drops
      // SQL-cached datasets; localCheckpoint blocks (duplicateClusters'
      // per-round lineage cuts) live as persisted RDDs in the BlockManager
      // and would otherwise accumulate across all 40+ queries, polluting
      // later measurements with eviction/GC pressure.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name took $dt%.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // a failed query's partial time must not read as a speedup: errors are
    // carried in the JSON so round-over-round comparison can see them
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
