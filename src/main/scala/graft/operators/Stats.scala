package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * GROUPED STATISTICS over integer-valued column pairs — the correlation
 * tier next to [[Timeseries]]' anomaly scoring, engineered the same way:
 * every MOMENT is an exact BIGINT and the only doubles are a fixed,
 * mirrorable closing expression.
 *
 * Pearson r in the INTEGER-LIFTED form
 *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
 * — numerator and both discriminants are exact integers (each
 * discriminant ≥ 0 exactly, by Cauchy–Schwarz), so the result is one
 * division over a product of two exact-integer square roots: an oracle
 * reproduces every bit, and the catastrophic cancellation of the
 * textbook Σ(x−x̄)(y−ȳ) streaming form cannot occur. NULL when either
 * variable is constant within its group (zero variance — r undefined).
 *
 * Scale shape: ONE partial-aggregated groupBy computes all five moments
 * — no window, no second pass; the closing arithmetic is a per-group
 * projection over |groups| rows. BIGINT headroom: n·Σxy stays exact
 * below ~9·10^18 — at 100 TB with large values, widen the moments to
 * DECIMAL(38,0).
 */
object Stats {

  /** (g, n_rows, r): per-group Pearson correlation of two integral
    * columns (cast to long — callers own the integer-valued contract). */
  def pearsonByGroup(df: DataFrame, group: String, x: String,
      y: String): DataFrame = {
    val m = df.select(col(group).as("g"), col(x).cast("long").as("x"),
        col(y).cast("long").as("y"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
    val dx = m("n") * m("sxx") - m("sx") * m("sx")
    val dy = m("n") * m("syy") - m("sy") * m("sy")
    m.select(col("g"), col("n").as("n_rows"),
      when(dx === 0 || dy === 0, lit(null).cast("double"))
        .otherwise(
          (m("n") * m("sxy") - m("sx") * m("sy")).cast("double") /
            (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
        .as("r"))
  }
}
