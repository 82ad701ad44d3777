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
}
