package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling"): given
 * a large RAW corpus and a (usually much smaller) TARGET distribution —
 * "select raw documents that look like the target" — fit two smoothed
 * unigram models over HASHED n-gram features, weight every raw document
 * by its log importance ratio
 *
 *   log w(x) = Σ_b k_b(x) · [ ln p̂_target(b) − ln p̂_raw(b) ]
 *
 * (k_b(x) = the document's count in hashed bucket b; Laplace-smoothed
 * ML estimates p̂(b) = (c_b + 1)/(N + B)), and keep the top-n. This is
 * the standard cheap distribution-matching selector for LLM pretraining
 * data (match Wikipedia/books, filter CommonCrawl); the paper's
 * Gumbel-noise resampling step is replaced by the deterministic top-n
 * variant (its own ablation baseline) because this engine's contract is
 * replayable results — a seeded Gumbel draw would certify nothing more
 * and cost determinism across engines.
 *
 * Features: word unigrams AND bigrams (the paper's choice), hashed by
 * the ENGINE-PORTABLE 62-bit shingle hash ([[graft.expressions.ShingleHashes]]
 * `portable=true` — poly31 | poly37<<31 codepoint folds, the
 * dedup_simhash_scale oracle family) into `buckets` buckets, so the
 * DuckDB oracle replays the whole pipeline op-for-op with NO corpus
 * assumption.
 *
 * Determinism: bucket counts and totals are exact integers; each
 * bucket's log-ratio `w_b` is ONE fixed-shape double expression; a
 * document's weight folds k_b·w_b in BUCKET ORDER (sort_array over the
 * per-doc struct list — bounded by min(doc tokens, buckets) ≤ B
 * entries, never corpus-sized); ties at the top-n boundary break by
 * doc_id — a total order.
 *
 * Scale shape: ONE scan hashes features natively (no string shuffles —
 * features leave the scan as (doc_id, bucket) longs); bucket stats are
 * two B-row partial aggregates; the w_b frame is ≤ B rows and
 * BROADCAST back onto the feature stream; the per-doc fold is a
 * map-side-combinable group by doc_id; selection is one
 * TakeOrderedAndProject. Nothing all-pairs, nothing driver-side, state
 * per document ≤ B entries — 100 TB-safe by construction.
 */
object Dsir {

  /** Hashed unigram+bigram bucket counts per document:
    * (doc_id, tgt, bucket, k). `isTarget` is evaluated on the input row
    * (e.g. `col("lang") === "en"`), carried through the explosion so the
    * target aggregate needs no join back. */
  def hashedFeatures(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame =
    docs.select(col("doc_id"), isTarget.as("tgt"),
        explode(concat(
          TextFunctions.shingleHashes(col("text"), 1, portable = true),
          TextFunctions.shingleHashes(col("text"), 2, portable = true)))
          .as("h"))
      .select(col("doc_id"), col("tgt"),
        pmod(col("h"), lit(buckets.toLong)).as("bucket"))
      .groupBy("doc_id", "tgt", "bucket")
      .agg(count(lit(1)).as("k"))

  /** Per-document log importance weight (doc_id, weight). */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int): DataFrame = {
    val feats = Caches.persistTracked(hashedFeatures(docs, isTarget, buckets))
    // persisted: weightsFrom references the marginals three times (rtot,
    // ttot, wb) — unpersisted, the ≤B-row aggregate re-ran the persisted
    // feature scan per reference (r15 ADVICE item; distributionShift
    // already persisted its copy)
    weightsFrom(feats, Caches.persistTracked(bucketMarginals(feats)), buckets)
  }

  /** BOTH per-bucket marginals in ONE pass over the feature frame (r15):
    * the old shape aggregated raw counts (rf) and target counts (tf) as
    * two separate scans + exchanges and LEFT-joined them. `sum(when(tgt,
    * k))` over a bucket with no target rows is NULL — exactly the join
    * miss the consumers coalesce to 0 — so (bucket, cr, ct) is the old
    * rf⋈tf row set bit-for-bit (integer sums, order-free) at half the
    * passes. ≤B rows; callers persist when they fan out. */
  private def bucketMarginals(feats: DataFrame): DataFrame =
    feats.groupBy("bucket").agg(sum("k").as("cr"),
      sum(when(col("tgt"), col("k"))).as("ct"))

  /** (doc_id, weight) from an already-persisted feature frame and its
    * [[bucketMarginals]] — the shared core of [[importanceWeights]] and
    * [[distributionShift]] (the latter reuses ONE feature scan AND one
    * marginal pass for both the selection and the KL counts). */
  private def weightsFrom(feats: DataFrame, marginals: DataFrame,
      buckets: Int): DataFrame = {
    val b = lit(buckets.toLong)
    val rt = marginals.agg(sum("cr").as("rtot"))
    val tt = marginals.agg(coalesce(sum("ct"), lit(0L)).as("ttot"))
    // ieeeLn, not Spark's log(): the oracle's ln is libm — see Ieee754Ln
    val wb = marginals
      .crossJoin(broadcast(rt)).crossJoin(broadcast(tt))
      .select(col("bucket"),
        (TextFunctions.ieeeLn((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
            (col("ttot") + b).cast("double"))
          - TextFunctions.ieeeLn((col("cr") + 1L).cast("double") /
            (col("rtot") + b).cast("double"))).as("w"))
    feats.join(broadcast(wb), "bucket")
      .groupBy("doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("bucket"), col("k"), col("w")))),
        lit(0.0),
        (acc, s) => acc + s.getField("k").cast("double") * s.getField("w"))
        .as("weight"))
  }

  /** Top-n documents by (weight DESC, doc_id): (doc_id, weight). */
  def select(docs: DataFrame, isTarget: Column, buckets: Int,
      n: Int): DataFrame =
    importanceWeights(docs, isTarget, buckets)
      .orderBy(desc("weight"), col("doc_id"))
      .limit(n)

  /**
   * DID THE SELECTION WORK? — one row certifying DSIR's effect on the
   * feature distribution: KL(raw ∥ target) vs KL(selected ∥ target)
   * over the hashed-feature buckets, plus the improved flag. Selection
   * that matches the target must move the selected distribution TOWARD
   * the target (smaller KL) — the kmeans_lloyd_sse ascent pattern
   * applied to importance resampling.
   *
   * Distributions are Laplace-smoothed over the RAW bucket domain
   * (selected ⊆ raw and target ⊆ raw, so every p is positive and the
   * KLs are finite — the domain choice the oracle mirrors):
   * p_S(b) = (c_S(b) + 1)/(N_S + buckets). Each KL folds its terms in
   * BUCKET ORDER through [[graft.functions.TextFunctions.ieeeLn]] —
   * bit-replayable. Cost: the same one feature scan, three B-row count
   * aggregates, two ≤B-element folds.
   */
  def distributionShift(docs: DataFrame, isTarget: Column, buckets: Int,
      n: Int): DataFrame = {
    val b = lit(buckets.toLong)
    val feats = Caches.persistTracked(hashedFeatures(docs, isTarget, buckets))
    // ONE marginal pass (≤B rows, persisted) feeds the selection weights
    // AND the KL counts — the old shape aggregated rf/tf twice each
    // (once inside weightsFrom, once here), four feature scans for two
    // marginals (r15)
    val marginals = Caches.persistTracked(bucketMarginals(feats))
    // selection from the SAME persisted feature frame — one scan total
    val selIds = weightsFrom(feats, marginals, buckets)
      .orderBy(desc("weight"), col("doc_id"))
      .limit(n)
      .select("doc_id")
    val sf = feats.join(selIds, Seq("doc_id"), "left_semi")
      .groupBy("bucket").agg(sum("k").as("cs"))
    val joined = marginals
      .join(sf, Seq("bucket"), "left")
      .select(col("bucket"), col("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cs"), lit(0L)).as("cs"))
    val tot = joined.agg(sum("cr").as("nr"), sum("ct").as("nt"),
      sum("cs").as("ns"))
    def p(c: Column, ntot: Column) =
      (c + 1L).cast("double") / (ntot + b).cast("double")
    val terms = joined.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (p(col("cr"), col("nr")) *
          TextFunctions.ieeeLn(p(col("cr"), col("nr")) / p(col("ct"), col("nt"))))
          .as("t_raw"),
        (p(col("cs"), col("ns")) *
          TextFunctions.ieeeLn(p(col("cs"), col("ns")) / p(col("ct"), col("nt"))))
          .as("t_sel"))
    terms.agg(
        aggregate(sort_array(collect_list(struct(col("bucket"), col("t_raw")))),
          lit(0.0), (a, s) => a + s.getField("t_raw")).as("kl_raw"),
        aggregate(sort_array(collect_list(struct(col("bucket"), col("t_sel")))),
          lit(0.0), (a, s) => a + s.getField("t_sel")).as("kl_selected"))
      .select(col("kl_raw"), col("kl_selected"),
        when(col("kl_selected") <= col("kl_raw"), 1L).otherwise(0L)
          .as("improved"))
  }
}
