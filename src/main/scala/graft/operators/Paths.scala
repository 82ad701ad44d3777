package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * TOP EVENT PATHS — the "user journey" histogram: for every entity, the
 * ordered sequence of its first `len` event types, counted across
 * entities. The navigation-flow / onboarding-analysis primitive next to
 * the funnel ([[Funnel]]) and transition-matrix ([[Markov]]) tiers.
 * Extension tier — the reference has no event ops (SURVEY.md §2.14).
 *
 * Determinism: events order by `(time, tieBreak)` with `tieBreak` unique
 * per row, so each entity's prefix — and therefore the path multiset —
 * is a pure function of the data. The path string is built by PIVOTING
 * the first `len` ranks into fixed columns (max-of-matching-rank — each
 * rank matches exactly one row) and `concat_ws`, which skips the NULL
 * tail of entities with fewer than `len` events identically in Spark
 * and DuckDB. No collect_list, no HOF — every expression codegens.
 *
 * Scale shape: the rank window partitions by the entity key (bounded by
 * per-entity activity — the sessionization window class) and rows ≤ len
 * survive it; the pivot is one partial-aggregated groupBy over ≤
 * |entities|·len rows; the path count's domain is the distinct-prefix
 * set. Callers take top-N under a TOTAL order (count desc, then path) —
 * planning as TakeOrderedAndProject, never a global sort.
 */
object Paths {

  /** (path, n_keys): each distinct first-`len` event-type sequence
    * (types joined with `sep`) and how many entities follow it. */
  def topPaths(events: DataFrame, key: String, time: String,
      tieBreak: String, typ: String, len: Int, sep: String = ">"): DataFrame = {
    require(len >= 1 && len <= 16, s"len must be in 1..16: $len")
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val ranked = events
      .select(col(key).as("k"), col(time).as("t"), col(tieBreak).as("tb"),
        col(typ).as("ty"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= len)
    val slots = (1 to len).map(i =>
      max(when(col("rn") === i, col("ty"))).as(s"ty$i"))
    val perKey = ranked.groupBy("k").agg(slots.head, slots.tail: _*)
    perKey
      .select(concat_ws(sep, (1 to len).map(i => col(s"ty$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_keys"))
  }
}
