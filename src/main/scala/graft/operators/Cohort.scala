package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * COHORT RETENTION grid — the classic product-analytics triangle: group
 * entities by the period of their FIRST event (the cohort) and count how
 * many of each cohort are still active N periods later. Extension tier —
 * the reference has no event ops (SURVEY.md §2.14).
 *
 * All time math is exact integer floor division over an integral time
 * column (e.g. `unix_micros(ts)`): bucket = t div unitsPerBucket (days),
 * cohort = each entity's min bucket, period = bucket-delta div
 * bucketsPerPeriod (weeks). No timestamp/timezone arithmetic anywhere —
 * an oracle replays the grid bit-for-bit with `//`.
 *
 * Scale shape, in order: (1) collapse the event stream to DISTINCT
 * (entity, bucket) — one partial-aggregated pass, and every later cost
 * is in active-entity-days, not events; (2) per-entity min bucket — a
 * second partial agg on the same key (the shuffle partitioning from (1)
 * is reusable); (3) join activity back to cohorts on the entity key —
 * both sides already hash-partitioned by it; (4) the final grid agg's
 * domain is |cohorts| × |offsets| — tiny at any corpus size. The
 * count is COUNT DISTINCT over entities (several active buckets of one
 * entity fold into one period), partial-aggregated like any other.
 */
object Cohort {

  /** (cohort_period, period_offset, n_active): for each first-activity
    * cohort, how many distinct entities were active `period_offset`
    * periods after their cohort period. `time` must be an integral
    * column; buckets are `unitsPerBucket` wide and periods are
    * `bucketsPerPeriod` buckets. */
  def retention(events: DataFrame, key: String, time: String,
      unitsPerBucket: Long, bucketsPerPeriod: Int): DataFrame = {
    require(unitsPerBucket > 0, s"unitsPerBucket must be positive: $unitsPerBucket")
    require(bucketsPerPeriod > 0, s"bucketsPerPeriod must be positive: $bucketsPerPeriod")
    val active = events
      .select(col(key).as("k"), col(time).as("t"))
      .withColumn("d", expr(s"t div $unitsPerBucket"))
      .select("k", "d").distinct()
    val cohorts = active.groupBy("k").agg(min("d").as("cohort_d"))
    active.join(cohorts, "k")
      .groupBy(
        expr(s"cohort_d div $bucketsPerPeriod").as("cohort_period"),
        expr(s"(d - cohort_d) div $bucketsPerPeriod").as("period_offset"))
      .agg(countDistinct("k").as("n_active"))
  }
}
