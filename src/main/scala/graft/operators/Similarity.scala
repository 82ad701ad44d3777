package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.functions.VectorFunctions

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`). Extension tier — the reference has no vector ops
 * (SURVEY.md §2.14).
 *
 * Two paths:
 *  - `bruteForceTopK`: exact cosine top-k, queries × corpus. The correctness
 *    baseline. Cost Q·N — right answer when Q is small (broadcast the
 *    queries) or N is modest.
 *  - `lshTopK`: IVF-style bucketed search — corpus and queries are hashed
 *    into random-hyperplane buckets; each query only scores its bucket's
 *    candidates (multi-probe over bands recovers recall). The 100 TB path:
 *    the corpus shuffle key is a small int, candidate lists shrink by the
 *    bucket fan-out, and no Q·N product is ever materialized.
 */
object Similarity {

  /** Explode a per-query top-k struct array into ranked rows. */
  private def explodeRanked(grouped: DataFrame): DataFrame =
    grouped
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.neighbor_id").as("neighbor_id"), round(col("s.cos"), 4).as("cos_sim"))

  /**
   * Shared rescore tail: exclude self-pairs, exact cosine, drop null scores
   * (zero-norm/malformed embeddings can never be a meaningful neighbor, and
   * `Scored.cos` is a primitive — a null would throw in the aggregator's
   * input encoder), then the partial-aggregated bounded top-k.
   * `cand` columns: query_id, q_emb, neighbor_id, c_emb.
   */
  private def rescoreTopK(cand: DataFrame, k: Int): DataFrame =
    explodeRanked(
      cand
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
        .filter(col("cos").isNotNull)
        .groupBy("query_id")
        .agg(TopK.topK(k)(col("neighbor_id"), col("cos")).as("nn")))

  /**
   * Exact top-k neighbors by cosine for each query vector. `queries` and
   * `corpus` both have (id, embedding). Self-pairs (same id) are excluded.
   * The queries side is broadcast (small by construction); ties broken by
   * neighbor id ascending for determinism.
   *
   * Top-k selection runs through [[TopKAggregator]] — partial-aggregated,
   * so each partition ships at most k candidates per query instead of
   * shuffling the full scored stream into a per-query sort window.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    rescoreTopK(c.crossJoin(broadcast(q)), k)
  }

  /**
   * LSH-bucketed approximate top-k: both sides get `bands` band values from a
   * `nBits` hyperplane signature; a query meets only corpus vectors sharing a
   * band value (multi-probe across bands), then exact cosine rescoring and
   * per-query top-k. Recall grows with bands; cost per query is the mean
   * bucket occupancy × bands instead of N.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nBits: Int = 16,
      bands: Int = 4, seed: Long = 42L, dim: Int = 64): DataFrame = {
    val bits = nBits / bands
    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
          VectorFunctions.hyperplaneSignature(col("embedding"), nBits, seed, dim).as("sig"))
        .select(col(idAs), col(embAs),
          VectorFunctions.lshBands(col("sig"), bands, bits).as(Seq("band", "band_val")))
    val q = banded(queries, "query_id", "q_emb")
    val c = banded(corpus, "neighbor_id", "c_emb")
    // bands DO generate duplicate (query, neighbor) meetings — dedup before
    // paying the rescore
    val cand = c.join(q, Seq("band", "band_val"))
      .dropDuplicates("query_id", "neighbor_id")
    rescoreTopK(cand, k)
  }

  /**
   * IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
   * partitions the corpus into `nCells` cells; each query probes its
   * `nProbe` nearest cells and exact-rescoring runs only over those cells'
   * members — cost per query ≈ nProbe/nCells of the corpus instead of N.
   *
   * The centroid table is driver-side tiny (nCells × dim doubles) and is
   * embedded as literals into the query-side probe expression, so probing
   * is a narrow map — the only shuffle is the cell join, keyed by a small
   * int. A query vector that exists in the corpus probes its own cell
   * first (its nearest centroid IS its assigned centroid), so self-recall
   * is guaranteed at any nProbe ≥ 1.
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int = 16,
      nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val featurize =
      array_to_vector(transform(col("embedding"), x => x.cast("double")))
    val corpusVec = corpus.select(col("vec_id"), col("embedding"),
      featurize.as("features"))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(corpusVec)
    val assigned = model.transform(corpusVec)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        col("cell"))
    val centroids = model.clusterCenters.map(_.toArray.toSeq)
    // nProbe nearest centroids per query, centroid coordinates as literals
    val cellDists: Seq[Column] = centroids.indices.map { c =>
      struct(VectorFunctions.l2Sq(col("embedding"), typedLit(centroids(c))).as("d"),
        lit(c).as("cell"))
    }
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(slice(sort_array(array(cellDists: _*)), 1, nProbe)).as("probe"))
      .select(col("query_id"), col("q_emb"), col("probe.cell").as("cell"))
    // no pair dedup needed: each corpus vector lives in exactly ONE cell
    // and a query probes distinct cells, so (query, neighbor) meets at most
    // once — a dropDuplicates here would be a pure extra shuffle
    rescoreTopK(assigned.join(q, "cell"), k)
  }
}
