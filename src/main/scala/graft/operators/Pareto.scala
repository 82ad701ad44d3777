package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * 2-D PARETO (dominance) FRONTIER — multi-objective selection: keep every
 * row no other row beats on BOTH dimensions (≥ on both, > on at least
 * one). The curation use case is picking the quality-vs-length /
 * cost-vs-score frontier instead of a single weighted scalarization.
 * Extension tier: the reference has no ranking beyond sort (SURVEY.md §2).
 *
 * Scale shape — the naive frontier is an all-pairs dominance test (a
 * cartesian, the forbidden plan): this implementation requires dimension
 * `xCol` to be DISCRETE AND BOUNDED (the quantile_exact trick — sizes,
 * grades, bucketed ranks; bucket a continuous x first) and collapses the
 * corpus to at most |x-domain| candidate points via one partial-agg
 * `max(y) per x` — a point (x, y < max(y|x)) is dominated by its own
 * group's maximum, so only the per-x maxima can be frontier members. The
 * dominance test then runs on the BOUNDED candidate table (a
 * broadcast-nested-loop anti-join of |x-domain|² pairs — bounded by
 * construction, the events_resample allowlist class), and winners
 * LEFT SEMI join back against the full table on (x, y) equality, keeping
 * ties. Nothing data-sized ever meets an inequality join.
 *
 * `y` may be any orderable column; it is selected (max), compared, and
 * equality-joined — never arithmetic — so stored doubles stay bit-exact.
 */
object Pareto {

  def frontier2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val m = df.groupBy(xCol).agg(max(yCol).as("__ymax"))
      .select(col(xCol).as("__x"), col("__ymax").as("__y"))
    val dominatedBy =
      col("q.__x") >= col("p.__x") && col("q.__y") >= col("p.__y") &&
        (col("q.__x") > col("p.__x") || col("q.__y") > col("p.__y"))
    val front = m.as("p").join(m.as("q"), dominatedBy, "left_anti")
    df.join(front,
      df(xCol) === front("__x") && df(yCol) === front("__y"), "left_semi")
  }
}
