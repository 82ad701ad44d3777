package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * RFM SCORING — per-entity Recency / Frequency / Monetary metrics from a
 * transaction stream, the classic customer-value segmentation input.
 * Extension tier — the reference has no aggregation beyond counting.
 *
 * Determinism is the repo's standard engineering: recency (max of an
 * integral time column) and frequency (count) are order-independent
 * integers; the ONE unbounded double aggregate — the monetary sum — runs
 * as a SORTED FOLD (`sort_array` over the entity's collected amounts,
 * then a left fold), so the addition order is a pure function of the
 * data and DuckDB replays it value-for-value (`list_sort` +
 * `list_reduce`). A plain SUM(amount) would be partition-order
 * nondeterministic — the lm_surprisal trap. The fold lambda is a
 * deliberate HOF outside the dedup/ANN no-lambda pin, running over the
 * entity's own transaction list (bounded by per-entity activity).
 *
 * Scale shape: ONE partial-aggregated groupBy on the entity key — no
 * window, no join; the collect_list is bounded by per-entity transaction
 * count (the same boundedness assumption as every per-key sequence op
 * here). Segmentation cuts (quintile scores) belong downstream on the
 * |entities|-sized output — deriving them here would need a global rank.
 */
object Rfm {

  /** (k, recency, frequency, monetary): per-`key` max of `time`,
    * transaction count, and the sorted-fold sum of `amount`. */
  def scores(tx: DataFrame, key: String, time: String,
      amount: String): DataFrame =
    tx.select(col(key).as("k"), col(time).as("t"), col(amount).as("amt"))
      .groupBy("k")
      .agg(max("t").as("recency"), count(lit(1)).as("frequency"),
        sort_array(collect_list(col("amt"))).as("amts"))
      .select(col("k"), col("recency"), col("frequency"),
        // native in-order sum (r16) — bit-identical twin of the
        // interpreted `aggregate` HOF, see ArrayFieldSum
        graft.functions.VectorFunctions.elemSum(col("amts"))
          .as("monetary"))
}
