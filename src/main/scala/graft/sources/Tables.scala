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

  /** The events table's `ts` physical type has varied across driver data
    * generations — TIMESTAMP(NANOS) (which Spark's reader rejects outright,
    * [PARQUET_TYPE_ILLEGAL]) and naive TIMESTAMP(MICROS) (which Spark reads
    * as TIMESTAMP_NTZ) have both shipped. This accessor normalizes every
    * layout to a plain µs TIMESTAMP so `unix_micros(ts)` downstream always
    * resolves and always equals DuckDB's `epoch_us(ts)` on the same file:
    *   - NANOS: read nanos as a long and convert ns → µs with exact integer
    *     division (`div`; a double division would lose precision —
    *     ns-since-epoch exceeds 2^53), matching the oracle's
    *     `epoch_ns(ts) // 1000` truncation.
    *   - NTZ (µs): cast to TIMESTAMP — epoch-preserving because every
    *     session entry point (Verify, Bench, SparkSpecBase) pins
    *     `spark.sql.session.timeZone=UTC`, mirroring DuckDB's reading of a
    *     naive parquet timestamp.
    *
    * SIDE EFFECT, deliberate: `nanosAsLong` is a session-level SQL conf (no
    * per-read option exists, and the conf is consulted again at execution,
    * so set-read-restore would break the returned lazy frame). After this
    * call every TIMESTAMP(NANOS) parquet column in the session reads as
    * LongType. Sessions built via Verify/Bench/the test harness set it up
    * front; this runtime set covers ad-hoc sessions. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
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
