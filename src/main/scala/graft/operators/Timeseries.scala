package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * TIME-SERIES ANALYTICS over grouped integer series (e.g. hourly event
 * counts per type): exact-moment anomaly scoring and exponential
 * smoothing. Extension tier — the reference has no time ops at all.
 *
 * Both operators take a long-format frame (`key`, `time`, integral
 * `value`) — the natural output of a counts groupBy — and both are
 * engineered for bit-reproducible oracles the repo's standard ways:
 *
 *  - [[zscoreAnomalies]] keeps every MOMENT integer: n, Σx, Σx² are
 *    exact BIGINTs, and the z-score is the INTEGER-LIFTED form
 *    z = (n·x − Σx) / √(n·Σx² − (Σx)²) — algebraically identical to
 *    (x − mean)/σ (both numerator and σ pick up a factor n under the
 *    lift), but the only doubles are ONE division and ONE sqrt of
 *    exact integers. The naive form subtracts two nearly-equal doubles
 *    and can even go NaN when rounding drives the computed variance
 *    negative; the lifted numerator n·x − Σx and discriminant
 *    n·Σx² − (Σx)² are exact (the discriminant is ≥ 0 EXACTLY, by
 *    Cauchy–Schwarz over integers), so neither hazard exists.
 *  - [[ewma]] is a SORTED FOLD (the lm_surprisal / RFM pattern): the
 *    recurrence s ← α·x + (1−α)·s is inherently sequential, so it runs
 *    as a left fold over the series sorted by time, seeded with the
 *    first value — DuckDB replays it step-for-step (`list_sort` +
 *    `list_transform` + seedless `list_reduce`, whose implicit seed is
 *    the first element, mirrored here by folding the tail over
 *    element 1).
 *
 * Scale shape: one partial-aggregated groupBy each; the per-key moment
 * table is |keys| rows (AQE broadcasts it into the scoring join); the
 * EWMA collect_list is bounded by the series length per key (hours per
 * type — thousands, not data-sized). At 100 TB the integer moments
 * n·Σx² approach BIGINT range only past ~10^9 events of count 10^4+ per
 * single key-hour — widen to DECIMAL(38) at that point.
 */
object Timeseries {

  /** (k, t, x, z): every input point with its population z-score within
    * its key's series — z = (n·x − Σx) / √(n·Σx² − (Σx)²), the plain
    * (x − mean)/σ with numerator and σ both lifted by the factor n so
    * every intermediate is an exact integer. NULL for constant series
    * (zero variance). */
  def zscoreAnomalies(series: DataFrame, key: String, time: String,
      value: String): DataFrame = {
    val s = series.select(col(key).as("k"), col(time).as("t"),
      col(value).cast("long").as("x"))
    val moments = s.groupBy("k").agg(
      count(lit(1)).as("n"), sum("x").as("sx"),
      sum(expr("x * x")).as("sxx"))
    // z = (x − sx/n) / sqrt(sxx/n − (sx/n)²) = (n·x − sx)/sqrt(n·sxx − sx²)
    // — numerator and discriminant exact; ONE division, ONE sqrt.
    val disc = col("n") * col("sxx") - col("sx") * col("sx")
    s.join(moments, "k")
      .select(col("k"), col("t"), col("x"),
        when(disc === 0, lit(null).cast("double"))
          .otherwise(
            (col("n") * col("x") - col("sx")).cast("double") /
              sqrt(disc.cast("double")))
          .as("z"))
  }

  /** (k, n_points, ewma): per-key exponential smoothing s ← α·x + (1−α)·s
    * over the series sorted by `time` (unique per key), seeded with the
    * first value; `alpha` must be in (0, 1]. */
  def ewma(series: DataFrame, key: String, time: String, value: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val a = lit(alpha)
    val b = lit(1.0d) - a
    val s = series.select(col(key).as("k"), col(time).as("t"),
      col(value).cast("double").as("x"))
    s.groupBy("k")
      .agg(count(lit(1)).as("n_points"),
        transform(sort_array(collect_list(struct(col("t"), col("x")))),
          e => e.getField("x")).as("xs"))
      .select(col("k"), col("n_points"),
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1),
          (acc, x) => a * x + b * acc).as("ewma"))
  }
}
