package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Repetition profiling — the Gopher-rules repetition-removal signal for
 * training-data curation (machine-generated and boilerplate text shows
 * abnormally high top-n-gram mass; curation drops docs above a threshold
 * on these fractions). Extension tier: the reference has no text ops
 * (SURVEY.md §2.14).
 *
 * Per document: token count, distinct-token count, the most frequent
 * token's count and fraction, bigram count and top-bigram fraction.
 *
 * Scale shape: tokens/bigrams are hashed per row by the native
 * [[graft.expressions.ShingleHashes]] loop (k=1 and k=2 — no interpreted
 * HOF, no string shuffles: the per-doc group keys are (doc_id, 64-bit
 * hash)), counted with partial aggregation, then collapsed to one row per
 * doc with a second partial aggregation. Counts over hashed n-grams equal
 * counts over raw n-grams as long as the hash is injective on the corpus
 * (collision odds ~n²/2^64 — the `ngram_jaccard` argument); thresholding
 * a repetition FRACTION is insensitive to even a stray collision.
 */
object TextProfile {

  def repetitionStats(docs: DataFrame): DataFrame = {
    def grams(k: Int, nAs: String, dAs: String, mAs: String): DataFrame =
      docs.select(col("doc_id"), explode(shingleHashes(col("text"), k)).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as(nAs), count(lit(1)).as(dAs), max("c").as(mAs))
    val uni = grams(1, "n_tokens", "n_distinct", "top_token_count")
    val bi = grams(2, "n_bigrams", "d2", "m2")
    uni.join(bi, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("top_token_count"),
        (col("top_token_count").cast("double") / col("n_tokens").cast("double"))
          .as("top_token_frac"),
        col("n_bigrams"),
        (col("m2").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"))
  }

  /**
   * CORPUS-level duplicated-span profile — the exact-substring-dedup
   * measurement of Lee et al., "Deduplicating Training Data Makes Language
   * Models Better" (the repetitionStats above is WITHIN-doc; this is
   * ACROSS-doc: what fraction of a document's k-token spans also occur in
   * some other document — boilerplate, licence headers, syndicated text).
   * Curation thresholds on `dup_frac` to drop documents that are mostly
   * corpus-duplicated even when no single whole-document near-dup exists.
   *
   * Per document: `n_spans` distinct k-shingles, `n_dup` of them shared
   * with at least one OTHER document, `dup_frac = n_dup / n_spans`.
   *
   * Scale shape: spans travel as 64-bit [[graft.functions.TextFunctions
   * .shingleHashes]] hashes, never strings (counts over hashes equal counts
   * over raw spans under the corpus-injectivity argument of
   * `ngram_jaccard`); the per-shingle document-frequency aggregation ships
   * one row per (doc, distinct shingle) with partial aggregation, and the
   * frequency table joins back to the postings on the hash — an equi-join
   * whose per-key fanout is the shingle's document frequency, never a
   * cross product. The distinct-shingle postings feed BOTH the frequency
   * aggregate and the join probe, so they persist through
   * [[Caches.persistTracked]] (caller contract: materialize, then
   * `Caches.releaseAll()`), avoiding a second corpus-wide shingling pass.
   *
   * A doc shorter than k tokens contributes its whole token string as its
   * single span (the ShingleHashes `n <= k` rule) — such a doc is "fully
   * duplicated" exactly when its whole text recurs, which is the right
   * degenerate reading.
   */
  def corpusDupSpans(docs: DataFrame, k: Int): DataFrame = {
    val postings = Caches.persistTracked(
      docs.select(col("doc_id"),
        explode(array_distinct(shingleHashes(col("text"), k))).as("h")))
    val freq = postings.groupBy("h").agg(count(lit(1)).as("nd"))
    val dup = postings.join(freq.filter(col("nd") >= 2), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    postings.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (coalesce(col("n_dup"), lit(0L)).cast("double") /
          col("n_spans").cast("double")).as("dup_frac"))
  }

  /**
   * CCNet-style statistical quality scoring: per document, the MEAN
   * UNIGRAM SURPRISAL −(1/len)·Σ ln p(token) under the corpus's own MLE
   * unigram model p(t) = c(t)/N — the cheap, training-free stand-in for
   * KenLM perplexity filtering (CCNet buckets docs into head/middle/tail
   * on exactly this kind of score: very LOW surprisal = repetitive
   * boilerplate, very HIGH = garbled/OOV-heavy text; curation keeps the
   * middle).
   *
   * Determinism is engineered the repo's standard way: every AGGREGATE is
   * integer (per-doc term counts k, corpus counts c, total N — all
   * order-independent), and the only double arithmetic is the final
   * per-doc fold, which runs over the doc's term list SORTED by token —
   * `sort_array` then a left fold, so the addition order is a pure
   * function of the data and DuckDB replays it term-for-term
   * (`list_sort` + `list_reduce`). A plain SUM of per-term doubles would
   * be partition-order nondeterministic — the same trap the BM25 row
   * avoids with its fixed three-term expression; here the term count is
   * unbounded so the sorted fold is the general form of that trick.
   *
   * Scale shape: ONE tokenize-and-explode pass, persisted through
   * [[Caches.persistTracked]] (caller contract: materialize, then
   * `Caches.releaseAll()` — the corpusDupSpans pattern), feeds both the
   * vocabulary count (group by token — vocabulary-sized, partial-agg)
   * and the per-(doc, token) counts; the 1-row corpus total is derived
   * from the vocabulary counts (`sum(c)` — no third pass) and broadcast
   * (the BM25-constants pattern). The per-doc `collect_list` is bounded
   * by the doc's DISTINCT-token count, and the fold lambda is the one
   * deliberate HOF in a wired plan outside the dedup/ANN no-lambda pin:
   * it exists solely to fix the double-addition order, runs over the
   * bounded distinct-term list (≪ doc length), and has no native
   * equivalent short of a custom Expression.
   */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = Caches.persistTracked(docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t")))
    val corpus = toks.groupBy("t").agg(count(lit(1)).as("c"))
    val tot = corpus.agg(sum("c").as("n_total"))
    val perDoc = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("k"))
      .join(corpus, "t")
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(struct(col("t"), col("k"), col("c")))).as("ts"),
        sum("k").as("n_tokens"))
    perDoc.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_tokens"),
        (aggregate(col("ts"), lit(0.0d), (acc, s) =>
          acc + s.getField("k").cast("double") *
            log(col("n_total").cast("double") / s.getField("c").cast("double")))
          / col("n_tokens").cast("double")).as("surprisal"))
  }

  /**
   * Add-one-smoothed BIGRAM predictability — the next model order up from
   * [[unigramSurprisal]]: per document, the mean INVERSE transition
   * probability 1/P(w₂|w₁) = (c(w₁·) + V) / (c(w₁w₂) + 1) over the doc's
   * adjacent token pairs, under the corpus's own Laplace-smoothed bigram
   * model (c(w₁·) = bigram-prefix count, V = corpus unigram vocabulary).
   * The arithmetic-mean inverse probability is the rational-arithmetic
   * sibling of perplexity (exp of mean ln of the same terms): monotone in
   * how surprising the doc's transitions are, so it buckets
   * templated/boilerplate vs garbled text the same way — chosen over the
   * ln form DELIBERATELY: +,×,/ are IEEE-pinned and replay bit-for-bit in
   * any engine, while ln diverges by 1 ulp between Catalyst
   * (StrictMath/fdlibm) and DuckDB (libm) on some arguments — measured on
   * this corpus at sf0.01 (lm_surprisal / BM25 pass with ln only because
   * their argument spaces happen to dodge the divergent inputs; a
   * per-(c1,c12)-pair argument space does not).
   *
   * Same determinism engineering as [[unigramSurprisal]]: every aggregate
   * integer (k, c12, c1, V), one per-doc double fold over the bigram list
   * SORTED by bigram string, replayed term-for-term by the oracle.
   * Scale shape: ONE tokenize pass (tracked persist); adjacency as the
   * co-partitioned positional self-equi-join (the top_ngrams shape — no
   * HOF over token arrays, no per-doc window); the bigram frame persists
   * once and feeds c12 / c1 / per-doc counts, all partial-aggregated;
   * V and nothing else crosses as a 1-row broadcast.
   */
  def bigramPredictability(docs: DataFrame): DataFrame = {
    val toks = Caches.persistTracked(docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "w"))))
    val bi = Caches.persistTracked(toks.as("a")
      .join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .select(col("a.doc_id").as("doc_id"), col("a.w").as("w1"),
        concat_ws(" ", col("a.w"), col("b.w")).as("g")))
    val vocab = toks.agg(count_distinct(col("w")).as("v"))
    val c12 = bi.groupBy("g").agg(count(lit(1)).as("c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val perDoc = bi.groupBy("doc_id", "g", "w1").agg(count(lit(1)).as("k"))
      .join(c12, "g").join(c1, "w1")
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(
          struct(col("g"), col("k"), col("c12"), col("c1")))).as("ts"),
        sum("k").as("n_bigrams"))
    perDoc.crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n_bigrams"),
        (aggregate(col("ts"), lit(0.0d), (acc, s) =>
          acc + s.getField("k").cast("double") *
            ((s.getField("c1").cast("double") + col("v").cast("double")) /
              (s.getField("c12").cast("double") + lit(1.0d))))
          / col("n_bigrams").cast("double")).as("mean_inv_prob"))
  }

  /**
   * T5-STYLE SPAN CORRUPTION (Raffel et al., JMLR 2020 §3.1.4) — the
   * denoising-objective data former: fixed-length token spans are masked
   * and replaced by numbered sentinels in the INPUT; the TARGET is the
   * sentinel-delimited masked content. `spanLen = 3, maskEvery = 7`
   * masks every 7th span ≈ 14% of tokens in 3-token spans — the paper's
   * 15%/span-3 operating point, made DETERMINISTIC by position (span s
   * masked iff s ≡ 0 mod maskEvery) instead of sampled: the repo's
   * oracle bar excludes RNG, and deterministic masking additionally
   * makes the example set reproducible across pipeline re-runs (the
   * same doc always yields the same example — incremental-ingest
   * friendly, like [[CorpusMix]]'s fingerprint cuts).
   *
   * Pure per-row string/integer work (HOFs over the token array — the
   * curation-tier affordance, as lm_surprisal's fold; no shuffle at all
   * beyond the scan): embarrassingly parallel at any corpus size.
   */
  def spanCorruption(docs: DataFrame, spanLen: Int = 3,
      maskEvery: Int = 7): DataFrame = {
    require(spanLen >= 1 && maskEvery >= 2,
      s"spanCorruption: need spanLen ≥ 1, maskEvery ≥ 2 ($spanLen, $maskEvery)")
    val ts = tokens(col("text"))
    def spanOf(i: Column) = floor(i / lit(spanLen)).cast("long")
    def isMasked(i: Column) = pmod(spanOf(i), lit(maskEvery.toLong)) === 0L
    def sentinel(i: Column) = concat(lit("<extra_id_"),
      floor(spanOf(i) / lit(maskEvery)).cast("long").cast("string"), lit(">"))
    val inputPieces = transform(ts, (x, i) =>
      when(!isMasked(i), x)
        .when(pmod(i, lit(spanLen)) === 0, sentinel(i))
        .otherwise(lit("")))
    val targetPieces = transform(ts, (x, i) =>
      when(isMasked(i) && pmod(i, lit(spanLen)) === 0,
        concat(sentinel(i), lit(" "), x))
        .when(isMasked(i), x)
        .otherwise(lit("")))
    def joined(p: Column) = array_join(filter(p, x => length(x) > 0), " ")
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        joined(inputPieces).as("input"),
        joined(targetPieces).as("target"),
        size(ts).cast("long").as("n_tokens"),
        size(filter(transform(ts, (_, i) => isMasked(i)), x => x))
          .cast("long").as("n_masked"))
  }

  /**
   * ITERATIVE BPE vocabulary induction (Sennrich et al., "Neural Machine
   * Translation of Rare Words with Subword Units") — the full merge loop
   * that `bpe_pairs` is step one of. Runs `k` merge steps; each step
   * counts adjacent symbol pairs over the corpus token stream, merges the
   * most frequent pair everywhere (ties broken by (lhs, rhs) string
   * order, making every step — and therefore the whole merge table —
   * deterministic), and repeats on the merged segmentation. Returns the
   * merge table: (step, lhs, rhs, n) — the induced vocabulary, in merge
   * order.
   *
   * Representation: a word's segmentation is its symbols joined by U+001F
   * (unit separator — outside every corpus charset; asserted nowhere
   * because a violation only mis-segments that word, never crashes).
   * Applying a merge is then one native `replace(seg, lhs␟rhs, lhsrhs)` —
   * left-to-right non-overlapping replacement, which is EXACTLY BPE's
   * greedy merge semantics ("aaa" + merge(a,a) → [aa, a]) and is
   * identical in Spark (`UTF8String.replace`) and DuckDB, so the oracle
   * replays the whole loop op-for-op.
   *
   * Scale shape: the working set is the DISTINCT-word table with counts
   * (Zipf-bounded — millions of rows at 100 TB, not trillions), persisted
   * once through [[Caches.persistTracked]]; each step's pair count is a
   * partial-aggregated groupBy over a pair domain bounded by the observed
   * symbol alphabet squared, and only the single argmax row is ever
   * collected (the bounded-eager pattern of `nearDupAuto`). Step i
   * re-derives segmentations by chaining i native `replace` calls over
   * the cached words — k² string work for k merges, the standard
   * trade-off against materializing a new corpus-wide state table per
   * step (which would cost k persists + k lineage cuts for the same k
   * scans at the k ≤ tens this targets).
   */
  def bpeMerges(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, _, _) = bpeLoop(docs, k)
    merges.toDF("step", "lhs", "rhs", "n")
  }

  /**
   * BPE ENCODING — the merge table APPLIED: per document, the whitespace
   * token count and the token count under the k-merge BPE vocabulary
   * (every word starts as characters; each learned merge shrinks its
   * segmentation). The trainer-facing number: n_bpe is what a context
   * window actually holds, and n_bpe/n_tokens tracks how much the
   * vocabulary compresses the corpus. Integer outputs only.
   *
   * Scale shape: the merge loop runs on the Zipf-bounded DISTINCT-word
   * table (exactly as [[bpeMerges]]); encoding is then ONE equi-join of
   * per-word symbol counts onto the doc-to-word stream plus a
   * partial-aggregated groupBy(doc_id) — the corpus text is never
   * re-segmented per document.
   */
  def bpeEncode(docs: DataFrame, k: Int): DataFrame = {
    val (_, words, seg) = bpeLoop(docs, k)
    val wsym = words.select(col("w"),
      size(split(seg, SEP)).cast("long").as("n_sym"))
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .join(wsym, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("n_sym").as("n_bpe"))
  }

  private val SEP = "\u001F"

  /** The k-step merge loop shared by [[bpeMerges]] and [[bpeEncode]]:
    * returns (merge table, tracked-persisted distinct-word table, the
    * final segmentation Column over `w`). */
  private def bpeLoop(docs: DataFrame, k: Int):
      (Seq[(Int, String, String, Long)], DataFrame, org.apache.spark.sql.Column) = {
    require(k >= 1, s"bpe: k must be >= 1, got $k")
    val words = Caches.persistTracked(docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt")))
    // initial segmentation: one symbol per character ("abc" → "a␟b␟c")
    val seg0 = rtrim(regexp_replace(col("w"), "(.)", "$1" + SEP), SEP)
    var seg = seg0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val best = words
        .select(col("cnt"), split(seg, SEP).as("sy"))
        .filter(size(col("sy")) >= 2)
        .select(col("cnt"), col("sy"),
          explode(sequence(lit(1), size(col("sy")) - 1)).as("i"))
        .select(element_at(col("sy"), col("i")).as("lhs"),
          element_at(col("sy"), col("i") + 1).as("rhs"), col("cnt"))
        .groupBy("lhs", "rhs").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val r = best.head
        val (lhs, rhs) = (r.getString(0), r.getString(1))
        merges += ((step, lhs, rhs, r.getLong(2)))
        seg = replace(seg, lit(lhs + SEP + rhs), lit(lhs + rhs))
        step += 1
      }
    }
    (merges.toSeq, words, seg)
  }

  /**
   * GOPHER-STYLE QUALITY RULE FILTER (Rae et al. 2021, "Scaling Language
   * Models: ... Gopher", Appendix A1.1 — the MassiveText rule set): the
   * cheap deterministic document filter every web-scale curation pipeline
   * runs before any model-based scoring. Five rules, each reported as its
   * own 0/1 column plus the conjunction, so downstream can audit WHICH
   * rule rejected a document (the funnel view), not just that one did:
   *
   *  - word count in [10, 90] (the paper's [50, 100k] rescaled to this
   *    corpus's 8–100-word documents — an operating point, not a law);
   *  - mean word length in [3, 10] characters;
   *  - ≥ 80% of words contain at least one alphabetic character;
   *  - symbol-to-word ratio ≤ 0.1 (hash runs / ellipses, the paper's
   *    symbols);
   *  - ≥ 2 stopword occurrences from the embedded 20-word list (the
   *    paper requires 2 of a small stop set — occurrences, not distinct,
   *    so the one-pass native counter below suffices).
   *
   * EVERY threshold compares integers by cross-multiplication (mean len
   * in [3,10] ⇔ 3·n ≤ Σlen ≤ 10·n; alpha ≥ 0.8 ⇔ 5·n_alpha ≥ 4·n) — no
   * doubles exist anywhere in this operator, so the DuckDB oracle is
   * exact by construction on any corpus.
   *
   * Scale shape: ONE codegen'd scan; word/length/stopword counts ride the
   * native [[graft.expressions.TokenStats]] single-pass struct (Catalyst
   * CSE collapses the three accessors to one eval), the alpha-word count
   * is the only per-token lambda (row-local, no shuffle), symbols are one
   * regexp_count. No joins, no aggregation — embarrassingly parallel at
   * any data size.
   */
  def gopherRules(docs: DataFrame): DataFrame = {
    val text = coalesce(col("text"), lit(""))
    val nw = tokenCount(text).cast("long")
    val sl = sumTokenLength(text)
    val nsw = stopwordCount(text)
    val na = size(filter(tokens(text), t => t.rlike("[A-Za-z]"))).cast("long")
    val nsym = regexp_count(text, lit("#+|\\.\\.\\.")).cast("long")
    def flag(c: Column) = when(c, 1L).otherwise(0L)
    val pWc = flag(nw >= 10L && nw <= 90L)
    val pMwl = flag(lit(3L) * nw <= sl && sl <= lit(10L) * nw)
    val pAlpha = flag(lit(5L) * na >= lit(4L) * nw)
    val pSym = flag(lit(10L) * nsym <= nw)
    val pSw = flag(nsw >= 2L)
    docs.select(col("doc_id"), nw.as("n_words"),
      pWc.as("pass_word_count"), pMwl.as("pass_mean_word_len"),
      pAlpha.as("pass_alpha_words"), pSym.as("pass_symbol_ratio"),
      pSw.as("pass_stopwords"),
      (pWc * pMwl * pAlpha * pSym * pSw).as("pass"))
  }

  /**
   * PER-SOURCE KL DIVERGENCE from the corpus unigram distribution —
   * KL(p_source ∥ p_corpus) = Σ_t p_s(t)·ln(p_s(t)/p(t)) — the domain
   * profiling number behind mixture reweighting (the DoReMi/DSIR view of
   * "how far is this domain from the blend"): sources with high KL are
   * the distinctive ones a mixture weight moves most. No smoothing is
   * needed: the sum ranges over the source's OWN tokens (p_s(t) > 0),
   * and every source token occurs in the corpus (p(t) > 0) — KL is
   * finite and ≥ 0 by construction.
   *
   * Determinism: counts exact integers; each token's contribution is one
   * fixed expression over [[graft.expressions.Ieee754Ln]] (libm-matching
   * ln); the per-source sum folds in TOKEN ORDER. Per-source fold state
   * is bounded by the source's vocabulary, not its token stream — for a
   * web-scale vocabulary, hash tokens into a fixed bucket space first
   * (the [[Dsir]] move; KL over the hashed feature distribution is the
   * quantity DSIR's importance weights estimate anyway).
   *
   * Scale shape: one tokenizing scan; (source, token) and (token) counts
   * are partial aggregates; the corpus total is a 1-row broadcast; output
   * is |sources| rows.
   */
  def sourceDivergence(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    val toks = Caches.persistTracked(docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col(groupCol).as("g"), explode(tokens(col("text"))).as("t")))
    val st = toks.groupBy("g", "t").agg(count(lit(1)).as("cst"))
    val ns = st.groupBy("g").agg(sum("cst").as("ns"), count(lit(1)).as("nd"))
    val ctot = toks.groupBy("t").agg(count(lit(1)).as("ct"))
    val n = toks.agg(count(lit(1)).as("n"))
    val ps = col("cst").cast("double") / col("ns").cast("double")
    val terms = st.join(ctot, "t").join(ns.select("g", "ns"), "g")
      .crossJoin(broadcast(n))
      .select(col("g"), col("t"),
        (ps * ieeeLn(ps / (col("ct").cast("double") / col("n").cast("double"))))
          .as("term"))
    val kl = terms.groupBy("g")
      .agg(aggregate(sort_array(collect_list(struct(col("t"), col("term")))),
        lit(0.0), (a, s) => a + s.getField("term")).as("kl"))
    ns.join(kl, "g")
      .select(col("g").as("source"), col("ns").as("n_tokens"),
        col("nd").as("n_distinct"), col("kl"))
  }
}
