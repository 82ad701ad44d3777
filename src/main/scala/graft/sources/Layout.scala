package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Write-side layout levers beyond what Spark's writer exposes directly.
 *
 * == Z-order (Morton) clustering ==
 *
 * Bucketing co-locates ONE key; partitioning prunes on ONE (usually
 * low-cardinality) column. When reads filter on SEVERAL independent
 * columns — (event_type, hour), (customer, date) — a table sorted
 * linearly by one of them packs the other's values across EVERY file, so
 * min/max-stats readers (parquet row-group pruning, manifest-based file
 * skipping) can prune nothing for the second column. Sorting by the
 * Z-ORDER key interleaves the columns' bits, so consecutive key ranges
 * map to axis-aligned tiles of the value space: every written file covers
 * a narrow range of EVERY interleaved column at once, and a predicate on
 * any of them skips most files. This is the clustering primitive behind
 * Delta/Iceberg `ZORDER BY`, expressed here as a plain sort key any
 * `repartitionByRange(...).sortWithinPartitions(...)` write can use.
 *
 * The key is an UNROLLED plan-time expression — `bits × |cols|`
 * shift/mask/or terms of native codegen'd integer arithmetic (no UDF, no
 * HOF lambda; the PlanSpec no-`lambdafunction` bar applies). Scale shape:
 * a narrow per-row projection computed map-side, then the standard
 * range-exchange the write needs anyway — Z-ordering costs nothing beyond
 * the sort the layout requires.
 *
 * Caller contract: inputs are interpreted as NON-NEGATIVE integers in
 * `[0, 2^bits)`; values outside contribute only their low `bits` bits
 * (locality degrades for those rows — they land in the wrong tile — but
 * nothing breaks: the key only orders data, it never answers queries).
 * Map skewed or unbounded domains onto bounded ranks first (hour-of-day,
 * bucketed price, dictionary code …), exactly as Delta's OPTIMIZE does
 * internally.
 */
object Layout {

  /**
   * Morton key: bit `i` of `cols(j)` lands at interleaved position
   * `i·n + (n−1−j)` (column 0 owns the most significant bit of each
   * round), for `i < bits`, `n = cols.size`. `bits · n ≤ 63` keeps the
   * key in a positive Long.
   */
  def zorderKey(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1, s"bits must be positive, got $bits")
    require(bits * cols.size <= 63,
      s"bits ($bits) × columns (${cols.size}) must fit a positive Long (≤ 63 bits)")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
    terms.reduce(_ bitwiseOR _)
  }

  /**
   * The standard Z-ordered write shape: range-partition by the Morton key
   * into `nFiles` contiguous key ranges (= axis-aligned tiles of the value
   * space), sort within each so parquet row groups inherit the locality,
   * and drop the helper column before handing back to `.write`.
   */
  def zordered(df: DataFrame, zCols: Seq[Column], nFiles: Int,
      bits: Int = 16): DataFrame = {
    // fail loudly instead of silently overwriting-then-dropping a user
    // column that happens to share the helper's name
    require(!df.columns.contains("__zkey"),
      "input already has a __zkey column — rename it before zordered()")
    df.withColumn("__zkey", zorderKey(zCols, bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /**
   * SMALL-FILE COMPACTION — the OPTIMIZE/maintenance rewrite every
   * incremental ingest eventually needs: streaming epochs
   * (`Trigger.AvailableNow` runs), CDC merges and appends each write a few
   * rows per task, and a 100 TB table quietly becomes millions of tiny
   * files — at which point every scan pays per-file open/footer overhead
   * and the driver pays the listing (the classic small-files failure; a
   * 1 MB-file million-object prefix is a cluster-killer independent of
   * data volume). This shapes a frame into `ceil(rows / targetRows)`
   * output files for rewrite.
   *
   * Cost: ONE counting job to size the output (for a parquet-backed frame
   * that is a footer-metadata scan, no data pages) + the one exchange the
   * rewrite needs anyway. With `sortCols` the exchange is a RANGE
   * partition + in-file sort, so the rewrite PRESERVES (or establishes)
   * clustering and its min/max-stats pruning — compaction and [[zordered]]
   * compose: pass the Morton key as the sort column. Without `sortCols`
   * it is a round-robin exchange — even file sizes, no ordering claim.
   *
   * Deliberately a frame-in/frame-out lever like [[zordered]] (caller owns
   * the `.write`): the engine has no table-format transaction log to swap
   * files atomically — that is Delta/Iceberg territory — so the contract
   * is rewrite-to-new-path, verify, swap.
   */
  def compact(df: DataFrame, targetRows: Long,
      sortCols: Seq[Column] = Nil): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val total = df.count()
    val nFiles = math.max(1L, (total + targetRows - 1L) / targetRows).toInt
    if (sortCols.isEmpty) df.repartition(nFiles)
    else df.repartitionByRange(nFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
  }
}
