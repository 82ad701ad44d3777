package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Windowed FIRST-TOUCH FUNNEL — the behavioral-analytics completion of
 * the events family (window/hopping/sessionize/as-of/resample): how many
 * users progress through an ordered sequence of event types, each step
 * within `windowUnits` of the previous one. Extension tier — the
 * reference has no event ops (SURVEY.md §2.14).
 *
 * Semantics (standard product-analytics funnel, first-touch): t₁ = the
 * user's FIRST step-1 event; t_{i+1} = the FIRST step-(i+1) event in the
 * half-open window (t_i, t_i + windowUnits]. A user reaches step i+1
 * exactly when that window contains one — an earlier out-of-order event
 * (a purchase before any view) neither helps nor blocks, and "first
 * within the window" (not "first after t_i, which must then be in
 * window") is the conversion-friendly reading every funnel product uses.
 *
 * Time is an INTEGRAL column (e.g. `unix_micros(ts)`) — window
 * arithmetic is exact integer addition/comparison, so an oracle replays
 * it with no timestamp-precision hazards (the events table is
 * TIMESTAMP(NANOS); Spark reads µs-truncated, so µs longs — floor(ns /
 * 1000) on the oracle side — are the ONE representation both engines
 * agree on bit-for-bit).
 *
 * Scale shape: each step is `filter(type) → join on the user key against
 * the previous step's (user, t) → partial-aggregated min` — the join's
 * build side is the users-reaching-step-i table, which only SHRINKS down
 * the funnel (AQE broadcasts it when it gets small); nothing ever
 * shuffles more than (user, t) pairs. Each step's output feeds BOTH the
 * next join and its own count, so levels persist through
 * [[Caches.persistTracked]] (caller contract: materialize, then
 * `Caches.releaseAll()`) — without it, counting step k would re-execute
 * the whole cascade per step.
 */
object Funnel {

  /** One DataFrame per step: (k, t) — the users reaching that step and
    * their step time. See semantics above. */
  def stepTimes(events: DataFrame, key: String, time: String, typ: String,
      steps: Seq[String], windowUnits: Long): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUnits > 0, s"windowUnits must be positive, got $windowUnits")
    val base = events.select(col(key).as("k"), col(time).as("t"),
      col(typ).as("ty"))
    var acc = List.empty[DataFrame]
    steps.zipWithIndex.foreach { case (st, i) =>
      val e = base.filter(col("ty") === st).select(col("k"), col("t"))
      val cur = Caches.persistTracked(
        if (i == 0) e.groupBy("k").agg(min("t").as("t"))
        else e.join(acc.head.select(col("k"), col("t").as("prev")), "k")
          .filter(col("t") > col("prev") &&
            col("t") <= col("prev") + lit(windowUnits))
          .groupBy("k").agg(min("t").as("t")))
      acc = cur :: acc
    }
    acc.reverse
  }

  /** The funnel report: (step 1-based, event_type, n_users), one row per
    * step, counts non-increasing down the funnel. */
  def stepCounts(events: DataFrame, key: String, time: String, typ: String,
      steps: Seq[String], windowUnits: Long): DataFrame =
    stepTimes(events, key, time, typ, steps, windowUnits)
      .zip(steps).zipWithIndex
      .map { case ((df, st), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(st).as("event_type"),
            col("n_users"))
      }
      .reduce(_ unionAll _)
}
