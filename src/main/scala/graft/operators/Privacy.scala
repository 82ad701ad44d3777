package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PRIVACY RISK AUDITS over tabular data — the re-identification
 * diagnostics a dataset release (or a training-data export of user
 * tables) runs before shipping. Extension tier: the reference has no
 * notion of data governance (SURVEY.md §2).
 */
object Privacy {

  /**
   * K-ANONYMITY RISK AUDIT (Sweeney 2002): group the table by its
   * QUASI-IDENTIFIER columns (the attribute combination an adversary
   * can link to external data — nation × segment × balance bucket in
   * the wired row) and report, for each requested k, how many QI groups
   * fall below size k and how many ROWS sit in them — the individuals
   * re-identifiable at that adversary strength. A release policy reads
   * one row ("at k = 5, 37 customers are at risk") and decides whether
   * to suppress or generalize.
   *
   * All integer: group sizes are counts, the per-k figures are
   * conditional count/sum pairs computed in ONE pass over the group
   * frame and stacked into (k, n_groups_below, n_rows_at_risk) rows —
   * the gopher_funnel idiom, so the oracle is exact on any table.
   * (Bucketing a continuous column into a QI is the CALLER's step —
   * done with deterministic arithmetic, e.g. floor(x / width), it keeps
   * the whole audit oracle-replayable.)
   *
   * Scale shape: one partial-aggregated groupBy on the QI key (the
   * group frame is ≤ |QI domain| rows), one tiny aggregate over it,
   * one stack — no window, no join, nothing driver-sized.
   */
  def kAnonymityRisk(rows: DataFrame, qi: Seq[Column], ks: Seq[Int]): DataFrame = {
    require(qi.nonEmpty && ks.nonEmpty, "kAnonymityRisk: empty QI or k list")
    val g = rows.groupBy(qi: _*).agg(count(lit(1)).as("sz"))
    val aggs = ks.flatMap(k => Seq(
      count(when(col("sz") < k, 1)).as(s"g$k"),
      coalesce(sum(when(col("sz") < k, col("sz"))), lit(0L)).as(s"r$k")))
    g.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${ks.size}, " +
        ks.map(k => s"CAST($k AS BIGINT), g$k, r$k").mkString(", ") +
        ") as (k, n_groups_below, n_rows_at_risk)")
  }
}
