package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Train/eval DECONTAMINATION — the benchmark-overlap step of a training-data
 * pipeline (the GPT-3/Pile recipe: a training document that shares n-grams
 * with an evaluation benchmark leaks the benchmark into the model; find and
 * drop such documents before training). Extension tier: the reference has no
 * text ops at all (SURVEY.md §2.14).
 *
 * For every train document: the number of its distinct word-k-shingles that
 * appear ANYWHERE in the eval corpus, and that count as a fraction of the
 * document's shingle set. Callers threshold `overlap_frac` (or
 * `n_overlap > 0` for the strict variant) and anti-join the flagged ids —
 * kept out of this operator so one scan serves any policy.
 *
 * Scale shape (100 TB train, benchmark-sized eval):
 *  - eval shingles are DISTINCT-ed and broadcast — benchmarks are small by
 *    definition (MMLU-scale: ~10^6 shingles ≈ 8 MB hashed), so the train
 *    side never shuffles: shingling, the overlap join, and the per-doc
 *    count all run map-side in the scan stage (partial aggregation on
 *    doc_id). A giant eval corpus would need the broadcast dropped —
 *    then the shuffle key is the shingle hash and the usual Zipf caveat
 *    applies: raise k until boilerplate n-grams vanish (real pipelines
 *    use 13-grams for exactly this reason; k is a parameter here).
 *  - shingles travel as 64-bit hashes (native [[ShingleHashes]] loop, one
 *    pass per document, no interpreted HOF): overlap COUNTS are identical
 *    to raw-string counts as long as the hash is injective on the corpus
 *    (collision odds ~n²/2^64 — the same argument, and the same DuckDB
 *    raw-string oracle technique, as `ngram_jaccard`).
 *
 * Output: (doc_id, n_sh, n_overlap, overlap_frac) for EVERY train doc —
 * zero-overlap docs included, so the output is the complete audit record,
 * not just the flagged subset.
 */
object Decontaminate {

  def overlapStats(train: DataFrame, evalDocs: DataFrame, k: Int = 3,
      hashShingles: Boolean = true): DataFrame = {
    def sh(c: Column): Column =
      if (hashShingles) array_distinct(shingleHashes(c, k))
      else array_distinct(shingles(c, k))
    val evalSh = evalDocs.select(explode(sh(col("text"))).as("s")).distinct()
    // Tracked-persisted: the shingle sets feed BOTH the postings leg and the
    // final (doc_id, n_sh) output leg — unpersisted, the train corpus would
    // be scanned and shingled twice. Caller releases via Caches.releaseAll()
    // after materializing (the same contract as Dedup's shingleSets).
    val trainSets = Caches.persistTracked(
      train.select(col("doc_id"), sh(col("text")).as("sh"))
        .withColumn("n_sh", size(col("sh")).cast("long")))
    val hits = trainSets
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .join(broadcast(evalSh), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    trainSets.select("doc_id", "n_sh")
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_sh").cast("double"))
  }

  /**
   * FUZZY train/eval decontamination — [[overlapStats]]' near-duplicate
   * face (the second pass of a real decontamination recipe: exact
   * n-gram overlap misses lightly-edited benchmark copies; a
   * train-vs-eval near-dup detector catches them): every train document
   * whose portable SimHash signature sits within `maxHamming` bits of
   * ANY eval document's signature.
   *
   * Runs the dedup tier's SCALE operating point (bands = 4 → 16-bit
   * band values, maxHamming = 3 < bands, so pigeonhole recall is
   * STRUCTURAL — a qualifying pair agrees on ≥ one full band and the
   * banded equi-join finds exactly the hamming ≤ 3 pair set; no corpus
   * separation assumption) with the ENGINE-PORTABLE shingle hash, so an
   * oracle recomputes the signatures themselves bit-for-bit (the
   * dedup_simhash_scale contract — exact on any corpus).
   *
   * Scale shape: one native-expression signature scan per side (64 bits
   * per doc); candidates come from the per-band equi-join of train
   * bands against the BROADCAST eval bands (benchmarks are small by
   * definition — the overlapStats argument; train × eval never forms);
   * hamming verification runs BEFORE the pair-dedup shuffle (the
   * simhashPairs ordering); the per-doc aggregate is partial-agg
   * count + min. Output: (doc_id, n_eval_near, min_hamming) — one row
   * per CONTAMINATED train doc, the flag list a pipeline anti-joins
   * away ([[overlapStats]] is the complete-audit face; zero-hit docs
   * are absent here by construction).
   */
  def fuzzyOverlap(train: DataFrame, evalDocs: DataFrame, bands: Int = 4,
      maxHamming: Int = 3, k: Int = 3): DataFrame = {
    val bits = 64 / bands
    def sig(df: DataFrame): DataFrame = df.select(col("doc_id"),
      simhashSig(shingleHashes(col("text"), k, portable = true)).as("sh"))
    // persisted: each signature frame feeds its band explode once, but
    // the persist keeps re-materializations (bench reps) one-scan
    val st = Caches.persistTracked(sig(train))
    val se = Caches.persistTracked(sig(evalDocs))
    val l = st.select(col("doc_id"), col("sh"),
      graft.functions.VectorFunctions.lshBands(col("sh"), bands, bits)
        .as(Seq("band", "band_val")))
    val r = se.select(col("doc_id").as("eval_id"), col("sh").as("she"),
      graft.functions.VectorFunctions.lshBands(col("sh"), bands, bits)
        .as(Seq("band", "band_val")))
    l.join(broadcast(r), Seq("band", "band_val"))
      .withColumn("hamming", hammingDistance(col("sh"), col("she")))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_id", "eval_id")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_near"),
        min(col("hamming").cast("long")).as("min_hamming"))
  }
}
