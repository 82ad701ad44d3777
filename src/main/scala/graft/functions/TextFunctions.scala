package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for the LLM-data-pipeline tier: tokenization,
 * quality scoring, language-ID, shingling, fingerprinting, SimHash, MinHash.
 *
 * Everything is built from Spark SQL builtins + higher-order functions
 * (`transform`/`aggregate`/`filter`) so the whole pipeline stays inside
 * whole-stage codegen — no Scala/Python UDF round-trips, which is what makes
 * these viable over 100 TB of documents.
 *
 * Hashing policy, two tiers:
 *  - `tokenHash`/`fingerprint` are pure integer polynomial expressions —
 *    deterministic AND reproducible in any engine (the DuckDB oracle
 *    replicates them in SQL lambdas); modular arithmetic uses M = 2^31-1
 *    (Mersenne prime): operands stay < 2^31, products < 2^62, so 64-bit
 *    `Long` math is exact.
 *  - `minhashSignature`/`simhash` hash shingles with Spark's codegen'd
 *    `xxhash64` for throughput — deterministic across runs/versions of this
 *    engine, but NOT an engine-portable contract; their correctness checks
 *    compare detected pair SETS against exact Jaccard, never raw signature
 *    values.
 *
 * The reference's only string op is substring containment
 * (`Search.cpp:65`); this module is extension tier (SURVEY.md §7.3 tier B).
 */
object TextFunctions {

  /** Mersenne prime 2^31-1: modulus for all polynomial hashing here. */
  private val M: Long = 2147483647L

  /** Whitespace tokenization — `split(trim(s), "\s+")`; empty string → []. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** One-pass native token counters (see [[graft.expressions.TokenStats]]):
    * every metric below is a field/ratio of this struct, so a document is
    * tokenized ONCE natively instead of once per metric through interpreted
    * HOF lambdas. The double arithmetic stays here, cast-for-cast identical
    * to the composable forms the DuckDB oracles mirror. */
  private def tokenStatsStruct(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.TokenStats(
      ColumnBridge.expression(text), stopwords))
  }

  def tokenCount(text: Column): Column = tokenStatsStruct(text).getField("n_tokens")

  /** Total characters across whitespace tokens (native TokenStats field). */
  def sumTokenLength(text: Column): Column =
    tokenStatsStruct(text).getField("sum_tok_len")

  /** Stopword-token occurrences (native TokenStats field, plan-time list). */
  def stopwordCount(text: Column): Column =
    tokenStatsStruct(text).getField("n_stopwords").cast("long")

  /** Natural log through java.lang.Math.log (bit-matches libm/DuckDB's
    * `ln`), NOT Spark's StrictMath-backed `log()` — see
    * [[graft.expressions.Ieee754Ln]]. */
  def ieeeLn(x: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.Ieee754Ln(ColumnBridge.expression(x)))
  }

  /**
   * BPE-ish subword count estimate: one unit per 6 characters of each token,
   * minimum one per token (long words split into multiple subword units under
   * byte-pair encodings; ~6 chars/unit is the classic English rule of thumb).
   */
  def subwordCountEstimate(text: Column): Column =
    tokenStatsStruct(text).getField("n_subwords")

  /**
   * BPE-ish regex token count: letter runs, digit runs, and punctuation
   * runs each count as one token (the GPT-2 pre-tokenizer shape, ASCII
   * charset so the pattern means the same thing in Java regex and RE2 —
   * which keeps the DuckDB oracle exact).
   */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+")).cast("long")

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val st = tokenStatsStruct(text)
    val n = st.getField("n_chars")
    when(n === 0, lit(0.0))
      .otherwise(st.getField("n_punct").cast("double") / n.cast("double"))
  }

  /** English stopword list used by the quality heuristics (tiny, embedded). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  /** Fraction of tokens that are stopwords — high values indicate natural
    * prose, near-zero indicates tables/code/boilerplate. */
  def stopwordRatio(text: Column): Column = {
    val st = tokenStatsStruct(text)
    val n = st.getField("n_tokens")
    when(n === 0, lit(0.0))
      .otherwise(st.getField("n_stopwords").cast("double") / n.cast("double"))
  }

  def meanTokenLength(text: Column): Column = {
    val st = tokenStatsStruct(text)
    val n = st.getField("n_tokens")
    when(n === 0, lit(0.0))
      .otherwise(st.getField("sum_tok_len").cast("double") / n.cast("double"))
  }

  /**
   * Composite quality score in [0,1] — the standard cheap pre-filter for web
   * corpus curation: rewards prose-like stopword density, sane token length,
   * low punctuation noise, and non-trivial length. Weights are fixed so the
   * score is a stable contract. Deliberately UNROUNDED: the weighted sum of
   * simple ratios is deterministic double arithmetic (identical bits in any
   * engine that mirrors the op order), whereas decimal rounding sits on
   * half-boundaries by construction here (ratios of small ints × 0.1-grid
   * weights) and engines disagree on those.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val swScore = least(stopwordRatio(text) * 5.0, lit(1.0)) // ≥20% stopwords → full marks
    val mtl = meanTokenLength(text)
    val mtlScore = when(mtl >= 3.0 && mtl <= 10.0, 1.0).otherwise(0.5)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    lenScore * 0.3 + swScore * 0.3 + mtlScore * 0.2 + punctScore * 0.2
  }

  // ---------------------------------------------------------------------------
  // Deterministic hashing (engine-stable contracts, pure integer expressions)
  // ---------------------------------------------------------------------------

  /** Per-token polynomial hash with a chosen multiplier: fold over chars,
    * h = (h·mult + codepoint) mod M. Result in [0, M). */
  def tokenHashWith(t: Column, mult: Long): Column =
    aggregate(
      transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1))).cast("long")),
      lit(17L),
      (h, c) => pmod(h * lit(mult) + c, lit(M)))

  /** Default per-token hash (multiplier 31). */
  def tokenHash(t: Column): Column = tokenHashWith(t, 31L)

  /**
   * Polynomial rolling-hash fingerprint of a document's token stream:
   * h = Σ tokenHash_j · B^(n-1-j) mod M, B = 1000003. Whitespace-
   * normalization-insensitive (hashes tokens, not raw bytes). Used for
   * exact-dup detection without carrying full text through shuffles at
   * 100 TB — fingerprint+length collisions are then verified exactly.
   *
   * Runs as the native per-row loop [[graft.expressions.DocFingerprint]];
   * [[fingerprintHof]] is the composable reference twin (both pinned to
   * the same plain-Scala fold in TextFunctionsSpec — the HOF form pays an
   * interpreted substr/ascii/pmod expression per CHARACTER).
   */
  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.DocFingerprint(
      ColumnBridge.expression(text)))
  }

  /** Composable HOF reference twin of [[fingerprint]]. */
  def fingerprintHof(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (h, t) => pmod(h * lit(1000003L % M) + tokenHash(t), lit(M)))

  /** Word k-shingles (k consecutive tokens joined by one space). Documents
    * shorter than k tokens yield their whole token string as one shingle. */
  def shingles(text: Column, k: Int): Column = {
    val ts = tokens(text)
    when(size(ts) <= k, array(concat_ws(" ", ts)))
      .otherwise(
        transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
  }

  /**
   * Native-loop twin of `transform(shingles(text, k), s => xxhash64(s))`
   * via [[graft.expressions.ShingleHashes]] — identical values (asserted in
   * ShingleHashesSpec), ~50× the throughput. The dedup operators' shingling
   * entry point; the composable [[shingles]] remains the semantic reference
   * and the raw-string path.
   */
  def shingleHashes(text: Column, k: Int, portable: Boolean = false): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.ShingleHashes(
      ColumnBridge.expression(text), k, portable))
  }

  /** Character n-grams of the whole string (for n-gram Jaccard / lang-ID). */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array(text))
      .otherwise(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  // ---------------------------------------------------------------------------
  // MinHash / SimHash signatures
  // ---------------------------------------------------------------------------

  /**
   * MinHash signature (array<long> of length `numHashes`) over word
   * `k`-shingles. Jaccard(A,B) ≈ fraction of agreeing signature positions.
   *
   * Performance shape (this is the hot loop of corpus dedup at 100 TB):
   *  - each shingle is hashed ONCE with the codegen'd `xxhash64` (folded to
   *    [0, M) so the affine universal-hash family below stays exact in
   *    Long), instead of a per-character polynomial fold;
   *  - ONE aggregate pass carries all `numHashes` running minima, updating
   *    each with h_i(x) = (a_i·x + b_i) mod M. The naive form — numHashes
   *    independent `array_min(transform(...))` passes — duplicates the
   *    shingle-hash subtree numHashes× in the expression tree (no CSE
   *    across interpreted higher-order functions), which measured ~14×
   *    slower on the sf0.1 corpus.
   */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    minhashFromFeatures(transform(shingles(text, k), s => xxhash64(s)), numHashes)

  /**
   * MinHash signature over an already-extracted feature array (any longs —
   * e.g. the tokenHash elements of [[graft.operators.Dedup.shingleSets]]'
   * hashed shingle sets). Lets a pipeline that has materialized hashed
   * shingle sets derive signatures from them directly: one shingling pass
   * feeds both LSH discovery and exact verification, and both measure
   * similarity of the SAME (stop-shingle-stripped) sets. Elements are
   * mixed through the codegen'd `xxhash64` before the affine family —
   * tokenHash values are polynomial and nearby shingles produce correlated
   * low bits, which would bias per-row minima.
   */
  def minhashFromFeatures(features: Column, numHashes: Int): Column =
    aggregate(
      transform(features, x => pmod(xxhash64(x), lit(M))),
      array_repeat(lit(M), numHashes), // M > every hash value in [0, M)
      (acc, x) => array((0 until numHashes).map(i =>
        least(element_at(acc, i + 1), minhashLane(i, x))): _*))

  /**
   * Native per-row twin of [[minhashFromFeatures]] via
   * [[graft.expressions.MinhashFromFeatures]] — identical signatures
   * (asserted in TextFunctionsSpec) with NO explode, NO aggregation, NO
   * shuffle: the signature is a pure function of the feature array, so it
   * materializes in the scan stage. The dedup operators' signature entry
   * point; [[minhashAgg]] remains for one-feature-per-row inputs.
   */
  def minhashSig(features: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.MinhashFromFeatures(
      ColumnBridge.expression(features), numHashes))
  }

  /**
   * Native per-row twin of [[simhashAgg]]/[[simhash]] over a shingle-hash
   * array via [[graft.expressions.SimhashFromHashes]] — identical
   * signatures (asserted in TextFunctionsSpec), zero shuffle, and usable
   * per-row in Structured Streaming (see
   * [[graft.streaming.EventsStreaming.dedupBySimhash]]).
   */
  def simhashSig(hashes: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.SimhashFromHashes(
      ColumnBridge.expression(hashes)))
  }

  /** Affine universal-hash lane i over x in [0, M): (a_i·x + b_i) mod M. */
  private def minhashLane(i: Int, x: Column): Column = {
    val a = (2L * i + 1L) * 0x9E3779B9L % M
    val b = (i + 1L) * 0x85EBCA77L % M
    pmod(lit(a) * x + lit(b), lit(M))
  }

  /**
   * MinHash signature as an AGGREGATE expression over one-feature-per-row
   * input: `exploded.groupBy("doc_id").agg(minhashAgg(xxhash64($"s"), 32))`.
   *
   * This is the throughput path for signature computation: Spark's
   * higher-order `aggregate` (used by [[minhashFromFeatures]]) is an
   * interpreted expression — every shingle pays a boxed 32-element array
   * rebuild outside codegen. As a groupBy aggregate the 32 per-lane `min`s
   * run inside whole-stage codegen over primitive longs WITH map-side
   * partial aggregation, so the shuffle still carries one row per doc.
   * Produces identical signatures to the column variants (asserted in
   * TextFunctionsSpec): pass `xxhash64(shingle)` as the feature to match
   * [[minhashSignature]], or the stored shingle-hash long to match
   * [[minhashFromFeatures]].
   */
  def minhashAgg(feature: Column, numHashes: Int): Column = {
    val x = pmod(xxhash64(feature), lit(M))
    array((0 until numHashes).map(i => min(minhashLane(i, x))): _*)
  }

  /**
   * SimHash signature as an AGGREGATE expression over one-shingle-HASH-per-
   * row input (pass `xxhash64(shingle)` or a [[shingleHashes]] element) —
   * same motivation as [[minhashAgg]]: the 62-counter vote array of the
   * column-level [[simhash]] is an interpreted per-shingle array rebuild,
   * while 62 codegen'd `sum`s partial-aggregate map-side. Votes on the bits
   * of `h` directly, so it is bit-identical to [[simhash]] over the same
   * shingles (asserted in TextFunctionsSpec).
   */
  def simhashAgg(h: Column): Column =
    (0 until 62).map { b =>
      val vote = when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L))
      when(sum(vote) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /**
   * 62-bit SimHash over word `k`-shingles: each shingle votes ±1 per bit of
   * its 64-bit `xxhash64`; the signature is the per-bit vote sign over bits
   * 0..61. Near-duplicate docs differ in few bits (Hamming distance).
   *
   * Features are shingles, not single tokens, on purpose: token-level
   * simhash degenerates on corpora drawn from a small shared vocabulary
   * (every document votes with the same words, so all signatures collapse
   * toward each other), while k-word shingles are effectively unique across
   * unrelated documents — measured on the test corpus, shingle features
   * separate planted near-dups from unrelated pairs where token features do
   * not separate at all.
   *
   * Single-pass: each shingle is hashed ONCE (codegen'd xxhash64); one
   * aggregate carries a 62-counter vote array; the finish lambda packs sign
   * bits, so the aggregate subtree is never duplicated in the expression
   * tree.
   */
  def simhash(text: Column, k: Int = 3): Column = {
    val hs = transform(shingles(text, k), s => xxhash64(s))
    aggregate(
      hs,
      array_repeat(lit(0L), 62),
      (acc, h) => array((0 until 62).map { b =>
        element_at(acc, b + 1) +
          when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
      }: _*),
      votes => (0 until 62).map { b =>
        when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_)))
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---------------------------------------------------------------------------
  // Language identification (Cavnar–Trenkle-style n-gram profile heuristic)
  // ---------------------------------------------------------------------------

  /** Tiny built-in character-marker profiles. Real deployments would ship
    * trained n-gram profiles; the classifier shape (score per language over
    * char n-gram hits, argmax with deterministic tie-break) is the real
    * contract and is fully columnar. */
  private[graft] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", "ing ", " is "),
    "de" -> Seq(" der ", " und ", " die ", "sch", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " est "),
    "es" -> Seq(" el ", " que ", " los ", " una ", " es "),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  /** Predicted language code; "und" when nothing scores. Ties break toward
    * the lexicographically-later language — deterministic. Runs as the
    * native one-pass loop [[graft.expressions.LangId]]; [[langIdHof]] is
    * the composable reference twin (which re-lowers the text inside each
    * contains term and pays interpreted struct-greatest per row — measured
    * ~0.5 ms/doc; equality asserted in TextFunctionsSpec). */
  def langId(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.LangId(
      ColumnBridge.expression(text), langMarkers))
  }

  /** Composable reference twin of [[langId]] (see scaladoc there). */
  def langIdHof(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = langMarkers.map { case (lang, marks) =>
      val score = marks.map(m => when(padded.contains(m), 1).otherwise(0))
        .reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") === 0, lit("und")).otherwise(best.getField("lang"))
  }
}
