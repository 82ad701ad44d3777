package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * INCREMENTAL VIEW MAINTENANCE for additive aggregates — the pattern that
 * keeps a 100 TB materialized aggregate alive without ever rescanning its
 * base: distributive aggregates (count, sum, and anything built from them)
 * form a commutative monoid per key, so
 *
 *   agg(base ∪ Δ)  =  agg(base) ⊕ agg(Δ)
 *
 * and maintaining the view is ONE full-outer merge of the stored aggregate
 * with the batch's aggregate — cost proportional to |Δ| plus the touched
 * keys, never to |base|. This is the algebra under every warehouse
 * materialized view / Delta-style incremental pipeline; [[Merge]] is its
 * row-level (latest-wins) sibling, this is the aggregate-level one.
 *
 * Exactness contract: counts are BIGINT; sums must be over integers (or
 * integral-valued doubles cast to long by the caller) for the merged
 * result to equal the from-scratch aggregate BIT-FOR-BIT — which is
 * exactly what the `agg_incremental` oracle certifies (the engine merges
 * base-agg ⊕ delta-agg; DuckDB aggregates the union from scratch; the
 * hashes must and do agree). Floating sums would differ from a re-scan by
 * partition-order ulps — the same reason the repo's exact rows keep sums
 * integral.
 *
 * Scale shape: both inputs are already aggregates (|keys| rows, not
 * |rows|); the merge is a single full-outer equi-join on the key —
 * partial-agg + one bounded shuffle, no window, no driver materialization.
 */
object Ivm {

  /**
   * Merge two per-key additive aggregates: every column in `measures`
   * is summed null-as-zero across the two sides; keys present on either
   * side survive. Schemas must match (same key column, same measure
   * columns).
   */
  def mergeAdditive(baseAgg: DataFrame, deltaAgg: DataFrame, key: String,
      measures: Seq[String]): DataFrame = {
    val b = measures.foldLeft(baseAgg) { (df, m) =>
      df.withColumnRenamed(m, s"__b_$m")
    }
    val d = measures.foldLeft(deltaAgg) { (df, m) =>
      df.withColumnRenamed(m, s"__d_$m")
    }
    val merged = b.join(d, Seq(key), "full_outer")
    measures.foldLeft(merged) { (df, m) =>
      df.withColumn(m,
        coalesce(col(s"__b_$m"), lit(0L)) + coalesce(col(s"__d_$m"), lit(0L)))
    }.select(key, measures: _*)
  }
}
