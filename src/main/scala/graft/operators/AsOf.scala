package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time (as-of) join — for every left row, attach the payload of
 * the LATEST right row with the same key and `right.ts <= left.ts`
 * (inclusive). The temporal-join primitive Spark's built-in operators
 * lack (reference has nothing temporal either — extension tier): market
 * data enrichment, feature-store lookups, "state as of the event".
 *
 * Implementation is the union-carry form, fully declarative:
 * tag both sides, union, and per key carry the last non-null right
 * payload forward over an event-time-ordered running window
 * (`last(..., ignoreNulls).over(rowsBetween(-inf, 0))`); right rows sort
 * BEFORE left rows at equal timestamps, which is exactly the inclusive
 * `<=` bound. Left rows then filter back out with the carried payload
 * attached. One shuffle (the window partitioning), no join product, no
 * per-row lookups — and the window is keyed by the JOIN key (user,
 * instrument, …), whose per-key row count is bounded by per-entity
 * activity: the same legitimate window class as sessionization, not a
 * low-cardinality hot-key window.
 *
 * CALLER CONTRACT (both make the result deterministic and are asserted
 * by the `events_asof` oracle):
 *  - `right` must be unique per (keys, tsCol) — pre-aggregate if not;
 *  - payload columns must be non-null (a null payload is indistinguishable
 *    from "no match yet" in the carry, so the carry would skip to an older
 *    row where a true ASOF join would surface the null).
 *
 * Output: every `left` column, plus each payload column as
 * `asof_<name>` (null when no right row precedes the left row).
 */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin: at least one key column")
    require(payloadCols.nonEmpty, "asofJoin: at least one payload column")
    val prefix = "asof_"
    // right side: keys + ts + prefixed payloads, left-only columns null
    val r = right.select(
      (keys.map(col) :+ col(tsCol)) ++
        payloadCols.map(c => col(c).as(prefix + c)): _*)
      .withColumn("_side", lit(1))
    // left side: all its columns, payload slots null until carried
    val l = payloadCols.foldLeft(left) { (df, c) =>
      df.withColumn(prefix + c, lit(null).cast(right.schema(c).dataType))
    }.withColumn("_side", lit(2))
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rAligned = leftOnly.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    // right (_side=1) sorts before left (_side=2) at equal ts → inclusive <=
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(l.unionByName(rAligned)) { (df, c) =>
      df.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 2).drop("_side")
  }
}
