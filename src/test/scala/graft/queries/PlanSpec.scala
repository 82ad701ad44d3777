package graft.queries

import graft.SparkSpecBase
import graft.SparkEntry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-shape assertions: the physical plans the 100 TB design depends on —
 * filter/column pushdown into parquet scans, broadcast joins on dim tables,
 * TakeOrderedAndProject for top-k (no global sort materialization), partial
 * (map-side) aggregation, and NO per-key windows in the dedup paths.
 */
class PlanSpec extends SparkSpecBase {

  // Caches.scoped: some queries build EAGERLY at construction time
  // (SequencePack's totals collect runs its upstream pipeline and leaves a
  // tracked cache behind even for plan-only extraction — see its scaladoc
  // caller contract). Plan extraction never needs the cache afterwards, so
  // every plan() releases what its construction accreted; without this the
  // whole-surface sweep below carries every eager query's persisted
  // intermediates through the rest of the suite run.
  private def plan(name: String): String =
    graft.operators.Caches.scoped {
      q(name).queryExecution.explainString(ExplainMode.fromString("formatted"))
    }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0001)

  test("filter_contains pushes the substring predicate into the parquet scan") {
    val p = plan("filter_contains")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("StringContains(p_name,bolt)"), p)
  }

  test("search_parity prunes the scan to the single needed column") {
    val p = plan("search_parity")
    assert(p.contains("ReadSchema: struct<p_name:string>"), p)
  }

  test("q1_agg pushes the shipdate range filter and aggregates partially") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    // two HashAggregate nodes = partial (map-side) + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("join_broadcast plans a BroadcastHashJoin (no fact-side shuffle join)") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("join_multi broadcasts all three dimension joins") {
    val p = plan("join_multi")
    // formatted explain shows each node in the tree and again in the details
    // section, so 3 joins appear ≥3 times
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("topk plans TakeOrderedAndProject (no global sort materialization)") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("group_count aggregates partially before the shuffle") {
    val p = plan("group_count")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("dedup candidate-generation paths contain no per-key Window") {
    for (name <- Seq("dedup_minhash", "dedup_simhash", "dedup_simhash_scale",
        "ngram_jaccard", "dedup_exact", "dedup_fingerprint", "dedup_embedding",
        "dedup_phash", "dedup_phash_survivors",
        "ann_topk", "ann_topk_lsh", "join_skew_salted", "corpus_sample")) {
      val p = plan(name)
      assert(!p.contains("Window"), s"$name plan has a Window:\n$p")
    }
  }

  test("events_asof pushes the event_type filters into the scans; one carry window") {
    val p = plan("events_asof")
    assert(p.contains("EqualTo(event_type,click)"), p)
    assert(p.contains("EqualTo(event_type,view)"), p)
    // the union-carry as-of join is ONE window pass keyed by the join key
    // (per-entity bounded, the sessionization class) — not a join product
    assert("\\bWindow\\b".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("events_session_assign range-joins as an equi-join, never a nested loop") {
    // the whole point of the binned interval join: a raw BETWEEN join plans
    // as BroadcastNestedLoopJoin (per-point interval scans); binning turns
    // it into a shuffled/broadcast equi-join on (user_id, bin)
    val p = plan("events_session_assign")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("corpus_sample runs the bounded top-k aggregator, partially aggregated") {
    // per-language sampling through a window would funnel the corpus into
    // ≤6 tasks (language cardinality); the TopKAggregator ships ≤10 rows
    // per partition per language with map-side partial aggregation
    val p = plan("corpus_sample")
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r.findAllIn(p).size >= 2,
      s"corpus_sample lacks partial aggregation:\n$p")
  }

  test("dedup_exact aggregates partially (map-side combine on the group key)") {
    val p = plan("dedup_exact")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("ann_topk broadcasts the query side, never the corpus") {
    val p = plan("ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("ann_topk_lsh streams the banded corpus through a broadcast join, no pair-dedup shuffle") {
    val p = plan("ann_topk_lsh")
    assert(p.contains("BroadcastHashJoin"), p)
    // the distinct-neighbor TopKAggregator replaced dropDuplicates: the only
    // exchange after the bucket join is the bounded top-k aggregation
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("decontaminate broadcasts the eval shingle set; train side never shuffles to the overlap join") {
    // the scale contract: eval is benchmark-sized, so the overlap join must
    // be a broadcast hash join (train postings stream map-side) and the
    // per-doc overlap count must aggregate partially
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("multimodal_scan reads through the binaryFile source") {
    val p = plan("multimodal_scan")
    assert(p.toLowerCase.contains("binaryfile"), p)
  }

  test("signature pipelines aggregate partially (map-side combine per doc)") {
    // minhash/simhash signatures are explode + groupBy aggregates — partial
    // + final HashAggregate/ObjectHashAggregate pairs, one row per doc
    // crossing the shuffle
    for (name <- Seq("dedup_minhash", "dedup_simhash_scale")) {
      val p = plan(name)
      assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2,
        s"$name lacks partial aggregation:\n$p")
    }
  }

  test("no interpreted higher-order function in any wired dedup/ANN plan") {
    // Every HOF lambda (transform/aggregate/zip_with/filter) renders as
    // `lambdafunction` in the plan. These run INTERPRETED — per-element
    // virtual dispatch outside whole-stage codegen — which is the known
    // 10-50× trap on candidate-heavy hot paths. All wired signature math
    // runs through native expressions or unrolled plan-time-constant
    // arithmetic; this pin keeps it that way.
    for (name <- Seq("dedup_minhash", "dedup_simhash", "dedup_simhash_scale",
        "ngram_jaccard", "dedup_exact", "dedup_fingerprint", "dedup_embedding",
        "dedup_phash", "dedup_phash_survivors", "dedup_exact_norm",
        "dedup_survivors", "dedup_survivors_composed", "dedup_containment",
        "dedup_incremental", "corpus_sample",
        "decontaminate", "decontaminate_fuzzy",
        "text_repetition", "corpus_mix", "curation_pipeline",
        "ann_topk", "ann_topk_lsh", "ann_topk_ivf", "ann_topk_ivf_exact",
        "kmeans_assign", "ann_topk_ivfpq", "ann_topk_ivfpq_exact",
        "ann_topk_ivfpq_res", "ann_topk_ivfpq_res_exact", "ann_topk_sq")) {
      val p = plan(name)
      assert(!p.contains("lambdafunction"),
        s"$name plan has an interpreted HOF:\n$p")
    }
  }

  test("bloom_semi_join probes the bitmap below a broadcast semi join, natively") {
    val p = plan("bloom_semi_join")
    // the probe (element_at + shiftright on the literal bitmap) must sit in
    // a Filter on the fact side, not after the join — the whole point is
    // pruning before the shuffle/probe
    assert(p.contains("shiftright"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // native probe: no interpreted HOF, no UDF (a filter expression can only
    // sit below the join here — Catalyst pushes filters down, never up)
    assert(!p.contains("lambdafunction"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("NO unbounded cartesian in ANY registered query (whole-surface sweep)") {
    // The blanket 100 TB guard: an accidental CartesianProduct or a
    // non-broadcast nested-loop join in any wired plan is a scale-killer.
    // Allowlist (each deliberately a bounded broadcast product):
    //  - ann_topk / ann_topk_ivf_exact: the broadcast QUERY BATCH (bounded,
    //    tens of rows) against the corpus — the documented exact-ANN shape;
    //  - events_resample: distinct-types × hour-grid, both tiny derived
    //    frames (≤ types × hours rows by construction);
    //  - hybrid_search: the broadcast of ONE query vector against the
    //    corpus (the ann_topk class, with |queries| = 1);
    //  - term_search_bm25: the broadcast of the 1-row corpus-constants
    //    frame (N, avgdl, per-term df) against the scored docs;
    //  - lm_surprisal: the broadcast of the 1-row corpus-total frame
    //    (N) against the per-doc term lists (same pattern);
    //  - graph_triangles / graph_triangles_ivm: the cross of 1-ROW stat
    //    aggregates (node/wedge, edge, triangle counts; the stored base
    //    count × the Δ-closure count) into the summary row;
    //  - knn_classify: the ann_topk broadcast QUERY BATCH (it composes
    //    bruteForceTopK) under the vote aggregation.
    //  - tfidf_topk / contrastive_pairs: the broadcast of the 1-row
    //    corpus-size frame (N) against the postings / anchors (the
    //    lm_surprisal pattern).
    //  - lm_bigram: the broadcast of the 1-row vocabulary-size frame (V)
    //    against the per-doc bigram lists (the lm_surprisal pattern).
    //  - ann_topk_pq / ann_topk_pq_exact: the broadcast QUERY BATCH
    //    against the CODE table (the ann_topk class — and the scanned
    //    side here is m ints per row, not the embedding).
    //  - pareto_frontier: the dominance anti-join of the per-x-maxima
    //    candidate table against itself — BOTH sides ≤ |x domain| rows by
    //    construction (the events_resample class).
    //  - collocations_lift: the two 1-row corpus-constant frames (N, Nb)
    //    against the surviving bigrams (the lm_surprisal pattern).
    //  - events_ffill: distinct-types × hour-grid (the events_resample
    //    class — it reuses the same dense-grid construction).
    //  - vocab_coverage: the cross of its two 1-ROW aggregates (corpus
    //    totals × top-K coverage — the graph_triangles class).
    //  - corpus_temperature: the 1-row total and 1-row normalizer against
    //    the ≤|strata|-row stratum frame (the lm_surprisal class).
    //  - graph_modularity / graph_modularity_q / graph_louvain_q /
    //    graph_louvain2_q: the 1-ROW edge-count m broadcast against the
    //    ≤|communities|-row (resp. 1-row) frame (the corpus_temperature
    //    class).
    //  - dsir_select: the two 1-ROW feature-total frames (rtot, ttot)
    //    against the ≤B-row bucket stats (the lm_surprisal pattern).
    //  - quality_classifier: the C-row class frame (C = 2 quality tiers,
    //    with its two 1-row constants) against the test token stream —
    //    the per-class score fan-out (the corpus_temperature class).
    //  - corpus_divergence: the 1-ROW corpus-token-total frame against
    //    the (source, token) counts (the lm_surprisal pattern).
    //  - kmeans_lloyd / kmeans_lloyd_sse: the broadcast 8-row centroid
    //    frame against the corpus (the ann_topk class), and the sse
    //    row's cross of its two 1-ROW SSE aggregates (the
    //    graph_triangles class).
    //  - ann_topk_sq: the broadcast QUERY BATCH against the CODE table
    //    (the ann_topk_pq class — the scanned side is the 4×-thinner
    //    int8 code array, never the embedding).
    //  - hybrid_rrf: the 1-row bm25 corpus-constants broadcast (the
    //    term_search_bm25 pattern) plus the 1-vector query-batch
    //    broadcast (the hybrid_search pattern) — it composes both
    //    certified rankers.
    val allowedProduct =
      Set("ann_topk", "ann_topk_ivf_exact", "ann_topk_ivf_lloyd_exact",
        "events_resample", "hybrid_search",
        "term_search_bm25", "lm_surprisal", "graph_triangles", "knn_classify",
        "tfidf_topk", "contrastive_pairs", "lm_bigram", "ann_topk_pq",
        "ann_topk_pq_exact", "pareto_frontier", "collocations_lift",
        "events_ffill", "vocab_coverage", "corpus_temperature",
        "graph_modularity", "graph_modularity_q", "graph_louvain_q",
        "graph_louvain2_q", "graph_triangles_ivm", "dsir_select",
        "quality_classifier", "corpus_divergence", "kmeans_lloyd",
        "kmeans_lloyd_sse", "dsir_shift", "ann_topk_sq", "hybrid_rrf")
    for ((name, _) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans an unbounded CartesianProduct:\n$p")
      if (!allowedProduct.contains(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join outside the allowlist:\n$p")
    }
  }

  test("term_search takes its top-10 with per-partition heaps, no window/global sort") {
    val p = plan("term_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
  }

  test("term_search_bm25 keeps term_search's shape: top-k heaps, no window, no UDF") {
    // the README claim made checkable: BM25 swaps integer tf scoring for
    // the weighted per-row expression WITHOUT changing the ranking plan —
    // still TakeOrderedAndProject, never a global sort or a rank window,
    // and the whole score is native codegen'd arithmetic (no UDF/HOF)
    val p = plan("term_search_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("lambdafunction"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("bpe_pairs ranks with top-k heaps over a partial aggregate, natively") {
    // the pair domain is bounded (≤ charset²), so the per-token explode
    // must collapse map-side (partial_count before the exchange) and the
    // top-20 must be TakeOrderedAndProject, not a global sort; the
    // position explode is native sequence()+substr — no lambda, no UDF
    val p = plan("bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count"), s"pair counts not map-side combined:\n$p")
    assert(!p.contains("lambdafunction"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("dup_span_profile aggregates span postings without windows or lambdas") {
    // per-shingle document frequency + join-back on the 64-bit hash: the
    // whole profile is partial-agg + equi-join — no per-key window, no
    // interpreted HOF in the wired plan (ShingleHashes is the native loop;
    // array_distinct/explode are native)
    val p = plan("dup_span_profile")
    assert(!p.contains("Window"), p)
    assert(!p.contains("lambdafunction"), p)
    assert(p.contains("partial_count"), s"span counts not map-side combined:\n$p")
  }

  test("sequence_pack runs its prefix sum partitioned — never a global single-task window") {
    // The naive spelling of a global running sum (Window.orderBy with no
    // partitionBy) funnels the whole table into ONE task. SequencePack's
    // distributed prefix sum must keep every window keyed by the bounded
    // range-partition id, and join the base offsets by broadcast.
    val p = plan("sequence_pack")
    val specs = "windowspecdefinition\\(".r.findAllIn(p).size
    val pidSpecs = "windowspecdefinition\\(pid#".r.findAllIn(p).size
    assert(specs >= 1, s"expected the running-sum window:\n$p")
    assert(specs == pidSpecs, s"unpartitioned (single-task) window in plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"base-offset join not broadcast:\n$p")
  }

  test("hybrid_search takes its top-10 with per-partition heaps, no rank window") {
    // linear score fusion keeps the plan window-free: a reciprocal-rank
    // fusion would need a GLOBAL row_number (single-task window)
    val p = plan("hybrid_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
  }

  test("table_profile reads its table ONCE (single scan for all column profiles)") {
    // a union of per-column aggregates would scan the table once per
    // column — the single-aggregate + explode shape reads it once
    val p = plan("table_profile")
    // count tree-form nodes ("Scan parquet  (n)") — formatted explain also
    // repeats each node in the details section
    assert("Scan parquet\\s+\\(\\d+\\)".r.findAllIn(p).size == 1,
      s"expected exactly one scan:\n$p")
  }

  test("inverted_index aggregates partially and builds posting heads without a window") {
    val p = plan("inverted_index")
    // partial + final HashAggregate pairs (countDistinct plans extra phases)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
  }
}
