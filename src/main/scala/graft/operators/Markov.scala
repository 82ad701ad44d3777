package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-sequence TRANSITION MATRIX — the empirical first-order Markov
 * estimate over per-entity event streams (which action follows which):
 * the "next-step prediction" / journey-analysis primitive next to the
 * funnel ([[Funnel]]) and sessionization tiers. Extension tier — the
 * reference has no event ops (SURVEY.md §2.14).
 *
 * Semantics: for every entity, order its events by `(time, tieBreak)`
 * (the tie-break column must be unique per row — e.g. `event_id` — so
 * the sequence, and therefore the pair multiset, is deterministic) and
 * count every consecutive (type → next type) pair; `prob` is the
 * row-normalized estimate cnt / Σ cnt over the same from-type. Both
 * factors are exact integers and the estimate is ONE IEEE double
 * division, so an oracle reproduces it bit-for-bit.
 *
 * Scale shape: the lead pass partitions by the entity key — bounded by
 * per-entity activity, the same window class as sessionization (a
 * per-key window is the scale trap only when one key holds the corpus);
 * the pair count partial-aggregates map-side into a |types|² domain, and
 * the normalizing totals frame is ≤ |types| rows — AQE broadcasts it
 * into the final join.
 */
object Markov {

  /** (from_type, to_type, cnt, prob): consecutive-event transition counts
    * per `typ` value pair across all `key` entities, with the
    * row-normalized probability estimate. */
  def transitions(events: DataFrame, key: String, time: String,
      typ: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val pairs = events
      .select(col(key).as("k"), col(time).as("t"), col(tieBreak).as("tb"),
        col(typ).as("ty"))
      .withColumn("next_ty", lead("ty", 1).over(w))
      .filter(col("next_ty").isNotNull)
    val counts = pairs
      .groupBy(col("ty").as("from_type"), col("next_ty").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("from_type").agg(sum("cnt").as("tot"))
    counts.join(totals, "from_type")
      .withColumn("prob", col("cnt").cast("double") / col("tot").cast("double"))
      .select("from_type", "to_type", "cnt", "prob")
  }
}
