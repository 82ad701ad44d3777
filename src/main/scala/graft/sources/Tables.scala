package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Source layer. The reference's only ingest is a caller-built in-memory
 * vector (`MapReduceFramework.cpp:360-376`) plus the client's directory
 * listing scan (`Search.cpp:98-111`). This engine's primary source is
 * partitioned parquet scans — columnar, predicate-pushdown- and
 * column-pruning-capable, which is what survives at 100 TB.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One table from a scale-factor directory. Filters/projections on the
    * returned DataFrame push down into the parquet scan (verified via
    * `.explain("formatted")` — see `PlanSpec`). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /**
   * The client's directory-listing scan (`Search.cpp:98-111`): one row per
   * directory entry, including `.` and `..` exactly as `readdir` yields them.
   * Listing happens driver-side (directory enumeration is metadata, not
   * data); the resulting names are parallelized into a Dataset. For scanning
   * huge object-store prefixes the parquet/binaryFile sources are the scale
   * path; this exists for reference parity.
   */
  def dirListing(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = dirs.flatMap { d =>
      val f = new java.io.File(d)
      if (f.isDirectory)
        (Array(".", "..") ++ f.list()).map(name => (d, name))
      else Array.empty[(String, String)]
    }
    rows.toDF("dir", "file_name")
  }
}
