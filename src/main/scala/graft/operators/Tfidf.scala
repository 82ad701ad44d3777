package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.shingleHashes

/**
 * TF-IDF weighted cosine similarity join — the weighted-sparse-vector
 * sibling of [[Dedup.ngramJaccard]]'s set-overlap join (Bayardo et al.,
 * "Scaling Up All Pairs Similarity Search", the tf-idf all-pairs setting;
 * Salton-style ln(N/df) weighting). Where Jaccard treats every shared
 * shingle equally, tf-idf cosine UP-WEIGHTS rare shared shingles and
 * down-weights boilerplate — the similarity a retrieval/clustering
 * pipeline actually ranks by.
 *
 * Scale shape:
 *  - Terms are PORTABLE 62-bit shingle hashes (poly31|poly37<<31 — the
 *    [[graft.expressions.ShingleHashes]] portable fold the oracle replays
 *    in SQL), so every shuffle carries (long, long, double) postings,
 *    never text.
 *  - tf/df/N are integer aggregates (order-independent); each weight
 *    w = tf·ln(N/df) is ONE double expression per posting.
 *  - The pair join is posting-list driven: cost Σ df² over KEPT terms,
 *    bounded by stripping terms with df > `maxShingleDf` (idf weighting
 *    makes hot-term stripping principled: a df≈N term carries idf≈0 and
 *    contributes nothing to the ranking it was stripped from).
 *  - Per-doc norms and per-pair dots are SORTED folds (sort_array by
 *    (hash, value) → aggregate) — the repo's standard trick for
 *    deterministic unbounded double sums, replayed by DuckDB via
 *    list_sort + list_reduce; the top-k lands in TakeOrderedAndProject
 *    (per-partition heaps, no global sort).
 *
 * Output: top-`topK` (doc_a, doc_b, cosine) pairs by cosine, ties broken
 * by ids. Tracked-persist intermediates — materialize, then
 * `Caches.releaseAll()`.
 */
object Tfidf {

  def cosinePairsTopK(docs: DataFrame, k: Int = 3, topK: Int = 100,
      maxShingleDf: Int = 1000): DataFrame = {
    // (doc, term-hash, tf) postings — multiplicity kept (tf), unlike the
    // dedup tier's distinct shingle SETS
    val terms = Caches.persistTracked(docs
      .select(col("doc_id"),
        explode(shingleHashes(col("text"), k, portable = true)).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("tf")))
    val dfT = terms.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Caches.persistTracked(terms.join(dfT, "h")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("h"),
        (col("tf").cast("double") *
          log(col("n").cast("double") / col("df").cast("double"))).as("w")))
    // norms and dots fold through the NATIVE in-order sum (r16,
    // ArrayFieldSum — bit-identical to the interpreted HOF twin, same
    // sorted order, so the oracle's list_reduce replay still matches)
    val norms = w.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("h"), col("w")))).as("ws"))
      .select(col("doc_id"),
        sqrt(graft.functions.VectorFunctions.fieldSumSq(col("ws"), 1))
          .as("nrm"))
    val l = w.select(col("h"), col("doc_id").as("doc_a"), col("w").as("w_a"))
    val r = w.select(col("h"), col("doc_id").as("doc_b"), col("w").as("w_b"))
    val dots = l.join(r, "h")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("h"),
        (col("w_a") * col("w_b")).as("p"))
      .groupBy("doc_a", "doc_b")
      .agg(sort_array(collect_list(struct(col("h"), col("p")))).as("ps"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.VectorFunctions.fieldSum(col("ps"), 1).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("nrm_a")),
        "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nrm_b")),
        "doc_b")
      // an all-stripped-terms doc has norm 0 → 0/0; exclude rather than NaN
      .filter(col("nrm_a") > 0.0 && col("nrm_b") > 0.0)
      .select(col("doc_a"), col("doc_b"),
        (col("dot") / (col("nrm_a") * col("nrm_b"))).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(topK)
  }
}
