package graft.operators

import org.apache.spark.sql.DataFrame
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
}
