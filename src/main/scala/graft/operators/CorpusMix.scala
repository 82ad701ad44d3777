package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Deterministic weighted corpus MIXING — the "data recipe" step of a
 * training-data pipeline: given per-stratum target rates (keep 100% of
 * books, 30% of web crawl, 0% of a blocked source), emit the subsampled
 * union. Extension tier: the reference has nothing of the kind
 * (SURVEY.md §2.14).
 *
 * The keep decision is `fingerprint(text) mod granularity < rate·granularity`
 * — a pure function of the document CONTENT, which buys three properties a
 * `rand()` sample cannot give at 100 TB:
 *  - REPRODUCIBLE: the same corpus and recipe yield byte-identical output
 *    on any cluster size, any retry, any engine (the fingerprint is the
 *    engine-portable polynomial fold the `doc_fingerprint` oracle already
 *    replicates in DuckDB — so the mix itself is oracle-checkable);
 *  - CONSISTENT: exact-duplicate documents land on the same side of the
 *    cut in every stratum, so mixing composes sanely with dedup in either
 *    order;
 *  - STATELESS: one narrow codegen'd filter in the scan stage — no
 *    sample pass, no shuffle, no seed coordination across executors.
 *
 * Rates are quantized to `granularity` (default 1/10000ths); strata not in
 * `rates` get `defaultRate`. The realized fraction tracks the target to
 * ~1/sqrt(n·rate) (hash uniformity), asserted in CorpusMixSpec.
 */
object CorpusMix {

  def sampleByStratum(docs: DataFrame, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      granularity: Int = 10000): DataFrame = {
    require(granularity > 0, "corpus mix: granularity must be positive")
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "corpus mix: rates must be in [0, 1]")
    // thresholds resolved to plan-time integer constants so an external
    // oracle can mirror them exactly (no floating-point in the cut)
    def quantize(r: Double): Long = math.round(r * granularity)
    val thresh: Column = rates.foldLeft(lit(quantize(defaultRate))) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === lit(stratum), lit(quantize(r))).otherwise(acc)
    }
    // fingerprint is non-negative (mod 2^31-1 fold), so % == pmod here and
    // any SQL engine's `%` mirrors it directly
    docs.filter(
      pmod(TextFunctions.fingerprint(col("text")), lit(granularity.toLong)) < thresh)
  }
}
