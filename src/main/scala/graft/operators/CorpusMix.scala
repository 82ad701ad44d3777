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

  /**
   * WEIGHTED SAMPLING WITHOUT REPLACEMENT — Efraimidis & Spirakis 2006
   * (the A-ES scheme): each row draws a uniform u from its OWN id and
   * ranks by the exponential key ln(u)/w; the top-n under that key are a
   * weighted sample without replacement with inclusion probabilities
   * proportional to the weights. The scheme's whole point here is that
   * it needs NO coordination: one narrow map computes every key, one
   * TakeOrderedAndProject takes the sample — at 100 TB this is the only
   * shape weighted subsampling can take (a sequential weighted reservoir
   * is a single-machine algorithm).
   *
   * Determinism (the engine's contract — a seeded `rand()` certifies
   * nothing across engines): u = (minstd(id) + 1)/(P + 1) ∈ (0, 1] with
   * minstd(id) = (id mod P)·48271 mod P, P = 2³¹−1 — the MIS priority
   * arithmetic, exact in 64-bit integers in any engine; the key is ONE
   * [[graft.functions.TextFunctions.ieeeLn]] and ONE division by the
   * positive integer weight; ranking (key DESC, id) is a total order.
   * Keys are ≤ 0, heavier weights pull them toward 0 — a doc with twice
   * the weight needs half the log-luck to be kept. Scaling ALL weights
   * by a positive constant divides every key by it and preserves the
   * ranking (the scale-invariance law CorpusMixSpec pins).
   */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    val P = 2147483647L
    val h = pmod(pmod(col(idCol), lit(P)) * lit(48271L), lit(P))
    val u = (h + lit(1L)).cast("double") / lit((P + 1L).toDouble)
    val key = TextFunctions.ieeeLn(u) / col(weightCol).cast("double")
    docs.select(col(idCol), col(weightCol), key.as("es_key"))
      .orderBy(desc("es_key"), col(idCol))
      .limit(n)
  }

  /**
   * Deterministic train/val/test SPLIT assignment — the held-out-set step
   * every training pipeline runs after curation. Same content-derived cut
   * as [[sampleByStratum]] (`fingerprint(text) mod granularity` against
   * cumulative plan-time integer bounds), which buys the properties a
   * random split cannot: reproducible on any cluster/retry/engine
   * (oracle-checkable membership), and exact duplicates always land in the
   * SAME split — the leakage guarantee (a dup straddling train/test is a
   * contamination bug this construction makes impossible). One narrow
   * codegen'd projection; no shuffle, no seed coordination.
   *
   * `splits` are (name, fraction) in priority order; fractions must
   * quantize exactly to `granularity` and sum to 1 (buckets partition the
   * domain — every doc gets exactly one split).
   */
  def assignSplits(docs: DataFrame, splits: Seq[(String, Double)],
      granularity: Int = 100, splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "split: need at least one bucket")
    val widths = splits.map { case (n, f) => n -> math.round(f * granularity) }
    require(widths.forall(_._2 > 0) && widths.map(_._2).sum == granularity,
      "split: fractions must be positive and quantize exactly to granularity")
    val bounds = widths.scanLeft(0L)(_ + _._2).tail // cumulative upper bounds
    val bucket = col("_graft_split_bkt")
    val expr = widths.zip(bounds).dropRight(1).reverse
      .foldLeft(lit(widths.last._1): Column) {
        case (acc, ((name, _), bound)) => when(bucket < bound, lit(name)).otherwise(acc)
      }
    docs
      .withColumn("_graft_split_bkt",
        pmod(TextFunctions.fingerprint(col("text")), lit(granularity.toLong)))
      .withColumn(splitCol, expr)
      .drop("_graft_split_bkt")
  }

  /**
   * TEMPERATURE-SCALED sampling weights (α = 0.5) per stratum — the
   * multilingual/multi-source rebalancing rule from XLM (Conneau & Lample
   * 2019) and mT5 (Xue et al. 2021): sample stratum i with probability
   * q_i ∝ p_i^α where p_i = n_i/N, flattening the head so low-resource
   * strata are up-sampled (boost = q/p > 1) and dominant ones down-sampled.
   * Output per stratum: n_docs, p, q, boost.
   *
   * α is FIXED at 0.5 so the exponent is `sqrt` — correctly rounded in
   * IEEE 754 and therefore bit-identical across engines, where a general
   * `pow(x, α)` is only faithfully rounded and diverges by ulps between
   * libm implementations (the lm_bigram ln lesson). The normalizer
   * Σ_j √p_j is a SORTED fold over the stratum frame (sort_array →
   * aggregate, the pageRank technique) — strata counts are bounded, but
   * partition order still isn't deterministic without it.
   *
   * Scale shape: one partial-agg count by stratum (the only data-sized
   * pass), then everything runs on ≤ |strata| rows — the 1-row total and
   * 1-row normalizer broadcast back onto the stratum frame (bounded
   * products, the lm_surprisal allowlist class).
   */
  def temperatureWeights(docs: DataFrame, stratumCol: String): DataFrame = {
    val c = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = c.agg(sum("n_docs").as("n_total"))
    val withP = c.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_total").cast("double")).as("p"))
    val z = withP
      .select(struct(col("stratum"), sqrt(col("p")).as("v")).as("sv"))
      .agg(sort_array(collect_list(col("sv"))).as("svs"))
      .select(aggregate(col("svs"), lit(0.0d),
        (a, x) => a + x.getField("v")).as("z"))
    withP.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_docs"), col("p"),
        (sqrt(col("p")) / col("z")).as("q"),
        ((sqrt(col("p")) / col("z")) / col("p")).as("boost"))
  }
}
