package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SCD Type 2 history build — fold a keyed event/snapshot stream into the
 * slowly-changing-dimension validity table: one row per ATTRIBUTE RUN with
 * `valid_from` = the run's first event time and `valid_to` = the next
 * run's start (null = current version). The warehouse-dimension primitive
 * (Kimball SCD2), and the temporal completion of [[Merge.applyChanges]]
 * (which keeps only the latest version; this keeps them all, with
 * validity intervals a range/as-of join can probe).
 * Extension tier: the reference is strictly single-input batch
 * (`MapReduceFramework.cpp:360`; SURVEY.md §2.7).
 *
 * Scale shape: two window passes PARTITIONED BY THE KEY (per-key history
 * is bounded — a dimension key has orders of magnitude fewer versions
 * than the corpus has rows — so the partition spec is never empty and no
 * key funnels the table through one task; PlanSpec's window rule):
 * lag-based change detection first (drop rows whose attributes null-safe
 * equal the previous row's), then lead for the closing timestamp on the
 * CHANGE rows only. Ordering inside a key is (tsCol, tieCol) — the
 * tie-break makes same-timestamp runs deterministic.
 */
object Scd {

  def history(events: DataFrame, key: String, tsCol: String, tieCol: String,
      attrs: Seq[String]): DataFrame = {
    val ord = Window.partitionBy(key).orderBy(col(tsCol), col(tieCol))
    val cur = struct(attrs.map(col): _*)
    val changes = events
      .select((key +: tsCol +: tieCol +: attrs).distinct.map(col): _*)
      .withColumn("_prev", lag(cur, 1).over(ord))
      .filter(col("_prev").isNull || !(col("_prev") <=> cur))
      .drop("_prev")
    changes
      .withColumn("version", row_number().over(ord).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(ord))
      .select((key +: attrs).map(col) ++
        Seq(col("version"), col("valid_from"), col("valid_to")): _*)
  }
}
