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

  /**
   * ROBUST per-group location/scale/outlier summary over a BOUNDED
   * integer-valued column: lower MEDIAN, MAD (median absolute deviation
   * — the robust scale that one corrupt value cannot move, unlike a
   * stddev), and the count of rows beyond `k`·MAD of the median (the
   * robust outlier rule; k=3 ≈ the classic |robust z| > 2 cut). The
   * integer-only sibling of [[Timeseries]]' z-score anomalies — EVERY
   * output is a BIGINT, so there is no floating point to mirror at all.
   *
   * Scale shape — the reason this composes from the quantile_exact
   * histogram rather than sorting rows: ONE partial-aggregated scan
   * builds the per-(group, value) histogram (bounded: |domain| rows per
   * group); the median is rank-selected off cumulative counts; then the
   * DEVIATION histogram is derived by TRANSFORMING the value histogram
   * (|v − median|, summing counts) — the raw table is never touched
   * again, so median, MAD, and the outlier count cost one scan plus
   * histogram-sized work. The per-key windows run over HISTOGRAM rows
   * (≤ |domain| per key), never the data — the quantile_exact
   * precedent. Lower-median rule throughout: value at 1-based rank
   * ⌊(n−1)/2⌋ + 1 — integer selection, no interpolation.
   */
  def robustStatsByGroup(df: DataFrame, group: String, value: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Caches.persistTracked(df
      .select(col(group).as("g"), col(value).cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("cnt")))
    def lowerMedian(h: DataFrame, vCol: String): DataFrame =
      h.withColumn("cum",
          sum("cnt").over(Window.partitionBy("g").orderBy(vCol)))
        .withColumn("n", sum("cnt").over(Window.partitionBy("g")))
        .groupBy("g")
        .agg(max("n").as("n"),
          min(when(col("cum") >= expr("(n - 1) DIV 2 + 1"), col(vCol)))
            .as("med"))
    val med = lowerMedian(hist, "v")
      .select(col("g"), col("n").as("n_rows"), col("med").as("median"))
    val dev = hist.join(med, "g")
      .select(col("g"), abs(col("v") - col("median")).as("v"), col("cnt"))
      .groupBy("g", "v").agg(sum("cnt").as("cnt"))
    val mad = lowerMedian(dev, "v").select(col("g"), col("med").as("mad"))
    val outliers = hist.join(med, "g").join(mad, "g")
      .groupBy("g")
      .agg(sum(when(abs(col("v") - col("median")) > lit(k.toLong) * col("mad"),
        col("cnt")).otherwise(lit(0L))).as("n_outliers"))
    med.join(mad, "g").join(outliers, "g")
      .select(col("g"), col("n_rows"), col("median"), col("mad"),
        col("n_outliers"))
  }

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
