package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.expressions.NearestCells
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
   * k-NEAREST-NEIGHBOR CLASSIFICATION — majority vote over the exact
   * cosine top-k (self-pairs excluded): the simplest embedding-space
   * classifier, and the standard label-propagation / weak-labeling
   * primitive of a training-data pipeline. Votes are exact integers and
   * the winner is picked under the TOTAL order (votes DESC, label ASC) —
   * a deterministic tie-break an oracle replays exactly; the per-query
   * rank window is bounded by k rows per query, never data-sized.
   * `corpus` needs (vec_id, embedding, labelCol). Returns
   * (query_id, pred_label, votes).
   */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("votes"), col("pred_label"))
    bruteForceTopK(queries, corpus, k)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col(labelCol).as("pred_label")), "neighbor_id")
      .groupBy("query_id", "pred_label").agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("query_id", "pred_label", "votes")
  }

  /**
   * LSH-bucketed approximate top-k: both sides get `bands` band values from a
   * `nBits` hyperplane signature; a query meets only corpus vectors sharing a
   * band value (multi-probe across bands), then exact cosine rescoring and
   * per-query top-k. Recall grows with bands; cost per query is the mean
   * bucket occupancy × bands instead of N.
   *
   * `hammingProbes = 1` turns on MULTI-PROBE in the Lv et al. sense: each
   * query additionally probes, per band, every bucket at Hamming distance 1
   * from its own band value (flip each of the band's `bits` bits). A true
   * neighbor that agrees on all-but-one hyperplane of a band — the dominant
   * miss mode for graded-similarity neighbors, measured recall 0.65 on the
   * hard corpus at exact-bucket probing — is recovered without touching the
   * CORPUS side at all: the expansion is query-side only (×(bits+1) rows on
   * the already-tiny broadcast batch), the corpus is hashed, bucketed, and
   * scanned exactly once either way, and per-query cost stays
   * bucket-occupancy × bands × (bits+1) — still no Q·N product. Per-band
   * collision probability rises from p^b to p^b + b·p^(b−1)(1−p); at the
   * hard corpus's p ≈ 0.8, b = 8 that is 0.17 → 0.50 per band, ~0.94 over
   * 4 bands. Duplicate meetings across probes collapse in the
   * distinct-neighbor TopK exactly as duplicate band meetings always did.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nBits: Int = 16,
      bands: Int = 4, seed: Long = 42L, dim: Int = 64,
      hammingProbes: Int = 0): DataFrame = {
    require(hammingProbes >= 0 && hammingProbes <= 1,
      s"hammingProbes must be 0 (exact bucket) or 1 (Hamming-1 multi-probe), got $hammingProbes")
    val bits = nBits / bands
    def banded(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
          VectorFunctions.hyperplaneSignature(col("embedding"), nBits, seed, dim).as("sig"))
        .select(col(idAs), col(embAs),
          VectorFunctions.lshBands(col("sig"), bands, bits).as(Seq("band", "band_val")))
    val q0 = banded(queries, "query_id", "q_emb")
    val q =
      if (hammingProbes == 0) q0
      else q0.withColumn("band_val",
        explode(array(col("band_val") +: (0 until bits).map(i =>
          col("band_val").bitwiseXOR(lit(1L << i))): _*)))
    val c = banded(corpus, "neighbor_id", "c_emb")
    // the query batch is small by construction (same contract as
    // bruteForceTopK): BROADCAST it, or Catalyst — blind to the filter
    // selectivity — shuffles the entire banded corpus into a sort-merge
    // join against a few hundred query rows.
    // Bands DO deliver duplicate (query, neighbor) meetings — the
    // distinct-neighbor TopKAggregator collapses them, so no pair-dedup
    // shuffle: candidates stream from this broadcast join straight into
    // partial aggregation (a dropDuplicates here measured ~400 MB of
    // embedding-carrying shuffle at a 200k-vector stress corpus; duplicate
    // rescoring is map-local and cheaper than shipping the pairs).
    rescoreTopK(c.join(broadcast(q), Seq("band", "band_val")), k)
  }

  /**
   * A fitted IVF coarse quantizer: the centroid matrix (driver-side tiny,
   * nCells × dim doubles) plus the corpus partitioned into cells —
   * `assigned` is persisted so many query batches probe ONE materialized
   * assignment (the build-once/probe-many contract a 100 TB ANN service
   * needs; the assignment is a single narrow scan, never refit per query).
   *
   * The assignment cache lives in [[Caches]]' INDEX registry — deliberately
   * outside the per-query registry `releaseAll()` drains, because the index
   * must survive any number of query-batch drains, but still tracked so the
   * hygiene suite can prove the whole build → save → load → append →
   * release lifecycle leaks nothing. Release with [[release]] when done.
   *
   * `appends` counts [[appendToIvfIndex]] generations since the last
   * lineage truncation (see there).
   */
  final case class IvfIndex(centroids: Seq[Seq[Double]], assigned: DataFrame,
      appends: Int = 0) {
    /** Unpersist the assignment and drop its index-registry entry. */
    def release(blocking: Boolean = false): Unit =
      Caches.releaseIndex(assigned, blocking)
  }

  /**
   * Fit the IVF coarse quantizer and assign the corpus to cells.
   *
   * The quantizer is Lloyd's k-means run DRIVER-SIDE on a bounded
   * deterministic sample (`sampleSize` vectors in xxhash64-of-id order — a
   * seeded pseudo-random draw that costs one TakeOrdered scan, ~1 MB
   * collected at dim 64). Cluster quality needs only a representative
   * sample, never the full corpus: fitting distributed KMeans over
   * everything at query time — 10 full-corpus passes — made the
   * "accelerated" path 2.5× SLOWER than brute force at sf0.1, and is a
   * non-starter at 100 TB. Sampling bounds the fit cost at any corpus
   * size; the one full-corpus pass left is the cell ASSIGNMENT, a narrow
   * codegen'd map via [[graft.expressions.NearestCells]] (centroids baked
   * into the plan as constants).
   */
  /** Deterministic pseudo-random sample: hash-of-id order, one TakeOrdered
    * scan (shared by the IVF and PQ quantizer fits — the cost stays bounded
    * at any corpus size). */
  private def sampleVectors(corpus: DataFrame, sampleSize: Int): Array[Array[Double]] =
    corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleSize)
      .select(transform(col("embedding"), x => x.cast("double")).as("e"))
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Driver-side Lloyd's k-means over a bounded sample (deterministic:
    * init = first k sample vectors, empty cells keep their previous
    * centroid). Extracted verbatim from the IVF build so the PQ
    * per-subspace fit is the SAME quantizer arithmetic. */
  private def lloyd(sample: Array[Array[Double]], k: Int,
      iterations: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    val kEff = math.min(k, sample.length)
    // init: first kEff sampled vectors (hash order ≈ random, deterministic)
    val centroids = Array.tabulate(kEff)(i => sample(i).clone())
    val counts = new Array[Long](kEff)
    var iter = 0
    while (iter < iterations) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      java.util.Arrays.fill(counts, 0L)
      for (v <- sample) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          var s = 0.0; var j = 0
          while (j < dim) { val d = v(j) - centroids(c)(j); s += d * d; j += 1 }
          if (s < bestD) { best = c; bestD = s }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < kEff) {
        // empty cell keeps its previous centroid (deterministic, no reseed)
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      iter += 1
    }
    centroids
  }

  def buildIvfIndex(corpus: DataFrame, nCells: Int = 16, sampleSize: Int = 2048,
      iterations: Int = 10): IvfIndex = {
    val sample = sampleVectors(corpus, sampleSize)
    require(sample.nonEmpty, "buildIvfIndex: empty corpus")
    val centroids = lloyd(sample, nCells, iterations)
    val cSeq: Seq[Seq[Double]] = centroids.map(_.toSeq).toSeq
    val assigned = Caches.persistIndex(corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        element_at(nearestCells(col("embedding"), cSeq, 1), 1).as("cell")))
    IvfIndex(cSeq, assigned)
  }

  /** IVF index over CALLER-SUPPLIED centroids — e.g. full-corpus
    * [[lloydCentroidsTrained]] output instead of `buildIvfIndex`'s
    * bounded-sample fit; same assignment scan, same release contract. */
  def buildIvfIndexWith(corpus: DataFrame,
      centroids: Seq[Seq[Double]]): IvfIndex = {
    val assigned = Caches.persistIndex(corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        element_at(nearestCells(col("embedding"), centroids, 1), 1).as("cell")))
    IvfIndex(centroids, assigned)
  }

  private def nearestCells(vec: Column, centroids: Seq[Seq[Double]],
      nProbe: Int): Column =
    ColumnBridge.column(
      NearestCells(ColumnBridge.expression(vec), centroids, nProbe))

  /**
   * LLOYD ASSIGNMENT STEP with caller-supplied centroids: (vec_id, cell)
   * for every corpus vector, cell = argmin squared-L2 centroid (ties to
   * the lowest cell index — [[NearestCells]]' total order). This is the
   * distributed half of k-means exposed as its own operator: the fit
   * ([[buildIvfIndex]]'s driver-side `lloyd` over a bounded sample) and
   * the assignment (this one full-corpus codegen'd map, centroids baked
   * into the plan as constants) — at 100 TB the assignment is the only
   * part that may touch all the data, and it is a narrow scan with NO
   * shuffle at all. Also the certification point for the cell-assignment
   * arithmetic the IVF tier rests on: `kmeans_assign` replays the exact
   * fold (left-to-right Σ(x−c)² in index order, float→double widening)
   * in DuckDB and hash-matches the resulting partition of the corpus.
   */
  def assignCells(corpus: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    corpus.select(col("vec_id"), cellColumn(col("embedding"), centroids).as("cell"))

  /** The cell-assignment COLUMN behind [[assignCells]] — argmin
    * squared-L2 centroid, ties to the lowest cell index, centroids baked
    * in as plan constants. Exposed so the streaming ingest twin
    * ([[graft.streaming.EventsStreaming.ivfIngestAssign]]) applies the
    * IDENTICAL certified expression (`kmeans_assign` oracle) per row. */
  def cellColumn(vec: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(nearestCells(vec, centroids, 1), 1)

  /**
   * ONE exact Lloyd MEAN-UPDATE: assign every vector to its nearest
   * centroid, return the per-cell coordinate means as the next centroid
   * matrix (empty cells keep their previous centroid — the standard
   * convention). This is the other half of distributed k-means next to
   * [[assignCells]]: full-corpus training, not the bounded-sample fit
   * `buildIvfIndex` uses.
   *
   * The mean's double sum is ORDER-SENSITIVE, so each (cell, dim) sum
   * runs as the DETERMINISTIC TWO-LEVEL FOLD the pagerank tier
   * certified: values salt into `foldBuckets` buckets by vec_id,
   * sort-fold within (cell, dim, bucket) by vec_id, then the ≤B bucket
   * sums sort-fold by bucket id — no aggregation key buffers more than
   * |cell|/B values, and the result is a pure function of the data (any
   * partitioning, any engine). Means come back to the driver as ONE
   * bounded nCells×dim collect (512 doubles at the wired 8×64 — the
   * IVF-centroid pattern) because the NEXT round's assignment needs
   * them as plan-time constants in [[graft.expressions.NearestCells]].
   *
   * At 100 TB: the assignment is a narrow no-shuffle scan; the fold is
   * one exchange hash-partitioned by (cell, dim); the collect is
   * nCells×dim regardless of data size.
   */
  def lloydCentroids(corpus: DataFrame, centroids: Seq[Seq[Double]],
      foldBuckets: Int = 16): Seq[Seq[Double]] = {
    val assigned = corpus.select(col("vec_id"),
      element_at(nearestCells(col("embedding"), centroids, 1), 1).as("cell"),
      transform(col("embedding"), x => x.cast("double")).as("ev"))
    val vals = assigned
      .select(col("vec_id"), col("cell"), posexplode(col("ev")).as(Seq("dim", "v")))
      .withColumn("bkt", pmod(col("vec_id"), lit(foldBuckets.toLong)))
    val l1 = vals.groupBy("cell", "dim", "bkt")
      .agg(aggregate(sort_array(collect_list(struct(col("vec_id"), col("v")))),
        lit(0.0), (a, s) => a + s.getField("v")).as("s1"))
    val l2 = l1.groupBy("cell", "dim")
      .agg(aggregate(sort_array(collect_list(struct(col("bkt"), col("s1")))),
        lit(0.0), (a, s) => a + s.getField("s1")).as("s2"))
    val cnt = assigned.groupBy("cell").agg(count(lit(1)).as("cnt"))
    val means = l2.join(cnt, "cell")
      .select(col("cell"), col("dim"), (col("s2") / col("cnt").cast("double")).as("m"))
      .collect() // bounded: nCells × dim rows
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    centroids.indices.map { c =>
      if (means.contains((c, 0))) centroids(c).indices.map(d => means((c, d)))
      else centroids(c)
    }
  }

  /** `rounds` Lloyd mean-updates from `seeds`: the trained centroids. */
  def lloydCentroidsTrained(corpus: DataFrame, seeds: Seq[Seq[Double]],
      rounds: Int, foldBuckets: Int = 16): Seq[Seq[Double]] = {
    var c = seeds
    (1 to rounds).foreach(_ => c = lloydCentroids(corpus, c, foldBuckets))
    c
  }

  /** `rounds` Lloyd mean-updates from `seeds`, then the final assignment:
    * (vec_id, cell) under the round-`rounds` centroids. */
  def lloydTrain(corpus: DataFrame, seeds: Seq[Seq[Double]],
      rounds: Int, foldBuckets: Int = 16): DataFrame =
    assignCells(corpus, lloydCentroidsTrained(corpus, seeds, rounds, foldBuckets))

  /**
   * GLOBAL SSE (the k-means objective) of a corpus under a centroid set:
   * Σ_v min_c ‖v − c‖² as ONE deterministic double — per-vector min
   * distance (the assignment fold's arithmetic, mirrored per cell over a
   * broadcast nCells-row frame), then the two-level vec_id-bucket sorted
   * fold for the order-sensitive global sum. 1-row output; the number
   * [[lloydCentroids]] provably does not increase round over round —
   * `kmeans_lloyd_sse` certifies exactly that on real data.
   */
  def sseUnder(corpus: DataFrame, centroids: Seq[Seq[Double]],
      foldBuckets: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = centroids.zipWithIndex
      .map { case (cv, i) => (i.toLong, cv) }.toDF("cell", "cv")
    val q = corpus.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("ev"))
    val distExpr = aggregate(
      transform(sequence(lit(1), size(col("cv"))),
        i => (element_at(col("ev"), i) - element_at(col("cv"), i)) *
          (element_at(col("ev"), i) - element_at(col("cv"), i))),
      lit(0.0), (a, x) => a + x)
    val d = q.crossJoin(broadcast(cdf))
      .select(col("vec_id"), distExpr.as("dist"))
      .groupBy("vec_id").agg(min("dist").as("d"))
    val l1 = d
      .groupBy(pmod(col("vec_id"), lit(foldBuckets.toLong)).as("bkt"))
      .agg(aggregate(sort_array(collect_list(struct(col("vec_id"), col("d")))),
        lit(0.0), (a, s) => a + s.getField("d")).as("s1"))
    l1.agg(aggregate(sort_array(collect_list(struct(col("bkt"), col("s1")))),
      lit(0.0), (a, s) => a + s.getField("s1")).as("sse"))
  }

  /**
   * IVF (inverted-file) approximate top-k over a prebuilt index: each query
   * probes its `nProbe` nearest cells and exact rescoring runs only over
   * those cells' members — cost per query ≈ nProbe/nCells of the corpus
   * instead of N. The only shuffle is the cell join, keyed by a small int.
   *
   * Assignment and probing share ONE expression ([[NearestCells]]), so a
   * query vector that exists in the corpus probes its own cell first (its
   * nearest centroid IS its assigned centroid) — self-recall is guaranteed
   * at any nProbe ≥ 1.
   */
  def ivfTopK(queries: DataFrame, index: IvfIndex, k: Int, nProbe: Int): DataFrame = {
    val p = math.min(nProbe, index.centroids.size)
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(nearestCells(col("embedding"), index.centroids, p)).as("cell"))
    // no pair dedup needed: each corpus vector lives in exactly ONE cell
    // and a query probes distinct cells, so (query, neighbor) meets at most
    // once — a dropDuplicates here would be a pure extra shuffle. Query
    // batch broadcast for the same reason as lshTopK.
    rescoreTopK(index.assigned.join(broadcast(q), "cell"), k)
  }

  /** One-shot convenience: build the index, then probe. Kept for the named
    * query surface; services doing many query batches should hold the
    * [[IvfIndex]] and call the overload above. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int = 16,
      nProbe: Int = 4, seed: Long = 42L): DataFrame =
    ivfTopK(queries, buildIvfIndex(corpus, nCells), k, nProbe)

  /**
   * Persist a fitted [[IvfIndex]]: centroids (tiny — nCells rows) and the
   * materialized corpus assignment, both as parquet under `path`. With
   * [[loadIvfIndex]] this makes build-once/probe-many survive a session
   * restart — the real ANN-service contract: fit and assign once on the
   * 100 TB corpus, then any number of later jobs probe the saved
   * assignment without re-running the quantizer or the assignment scan.
   */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .repartition(1) // nCells rows — one tiny file
      .write.mode("overwrite").parquet(path + "/centroids")
    index.assigned.write.mode("overwrite").parquet(path + "/assignment")
  }

  /** Load an index written by [[saveIvfIndex]]. The assignment comes back
    * persisted (the probe-side contract); centroids are collected
    * driver-side (nCells × dim doubles — the same plan-time constant the
    * build path bakes in). Probe results are identical to the in-memory
    * index's (round-trip asserted in SimilaritySpec). */
  def loadIvfIndex(spark: SparkSession, path: String): IvfIndex = {
    val centroids: Seq[Seq[Double]] = spark.read.parquet(path + "/centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid"))).toSeq
    require(centroids.nonEmpty, s"loadIvfIndex: no centroids at $path")
    val assigned = Caches.persistIndex(spark.read.parquet(path + "/assignment"))
    IvfIndex(centroids, assigned)
  }

  /**
   * INCREMENTAL index maintenance: assign `newVectors` (vec_id, embedding)
   * to the EXISTING centroids — no refit, no rescan of the already-indexed
   * corpus. This is the missing piece of the build-once/probe-many story:
   * a 100 TB corpus that gains a daily ingest batch should pay one narrow
   * assignment scan over the BATCH, not a rebuild over everything.
   *
   * The append uses the same [[graft.expressions.NearestCells]] expression
   * as build and probe, so the self-probe guarantee extends to appended
   * vectors: an appended vector's nearest centroid IS its assigned cell,
   * and any query probing nProbe ≥ 1 cells reaches it exactly when the
   * quantizer would. What append does NOT do is move centroids — if the
   * appended data's distribution drifts from what the quantizer was fitted
   * on, cells grow unbalanced and probe cost degrades gracefully (more
   * candidates per cell), never incorrectly (membership stays exact).
   * Rebuild cadence under drift is caller policy; at nProbe = nCells the
   * appended index is provably ≡ a full rebuild over the union
   * (SimilaritySpec asserts it).
   *
   * Returns a NEW index whose assignment is the persisted union; the input
   * index's cached assignment is untouched (callers holding only the new
   * index should `old.release()` once the append is materialized).
   *
   * LINEAGE CAP: each append layers one more `unionAll` over the previous
   * assignment's plan, and once the caller releases the old generation's
   * cache (as advised above), a cache eviction on the new index would
   * re-run the WHOLE append chain's lineage — unbounded plan depth under
   * the daily-ingest usage this exists for. So every `checkpointEvery`-th
   * append (default 8) materializes the union through `localCheckpoint`
   * (eager, lineage-truncating, executor-local — no HDFS-style checkpoint
   * dir needed) instead of a plain persist: recovery cost after that is
   * one checkpoint read, never a replay of N append generations. Callers
   * that prefer durable truncation can [[saveIvfIndex]]/[[loadIvfIndex]]
   * round-trip at their own cadence instead; the counter restarts either
   * way (`appends` resets on truncation).
   */
  def appendToIvfIndex(index: IvfIndex, newVectors: DataFrame,
      checkpointEvery: Int = 8): IvfIndex = {
    require(checkpointEvery >= 1, s"checkpointEvery must be ≥ 1, got $checkpointEvery")
    val newAssigned = newVectors
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        element_at(nearestCells(col("embedding"), index.centroids, 1), 1).as("cell"))
    val union = index.assigned.unionAll(newAssigned)
    if (index.appends + 1 >= checkpointEvery)
      // localCheckpoint persists internally — register without re-persisting
      IvfIndex(index.centroids, Caches.trackIndex(union.localCheckpoint()), 0)
    else
      IvfIndex(index.centroids, Caches.persistIndex(union), index.appends + 1)
  }

  /**
   * DRIFT SIGNAL for an appended index: appends assign to FIXED centroids
   * (never refit), so a drifting ingest distribution unbalances cells
   * silently — probe cost degrades gracefully (more candidates in the fat
   * cells), never incorrectly. This makes the degradation observable:
   * per-cell occupancy counts (one partial-aggregated `groupBy("cell")` —
   * ≤ nCells result rows, safe to collect at any corpus size) plus the
   * max/median occupancy ratio as a scalar rebuild trigger. A freshly
   * fitted quantizer on typical data sits near ~1-3×; a ratio drifting
   * past ~4× means the fattest cell does 4× the probe work the quantizer
   * was fitted for — time to [[buildIvfIndex]] over the union (one refit +
   * one assignment scan, the same cost a fresh build always was).
   */
  def ivfCellOccupancy(index: IvfIndex): DataFrame =
    index.assigned.groupBy("cell").agg(count(lit(1)).as("n"))

  /** Max/median cell-occupancy ratio of [[ivfCellOccupancy]] — ≥ 1.0, or
    * 0.0 for an empty assignment. See the rebuild-trigger guidance above. */
  def ivfImbalance(index: IvfIndex): Double = {
    val counts = ivfCellOccupancy(index).select(col("n"))
      .collect().map(_.getLong(0)).sorted
    if (counts.isEmpty) 0.0
    else counts.last.toDouble / counts(counts.length / 2).toDouble
  }

  /**
   * A fitted PRODUCT-QUANTIZATION index (Jégou et al. 2011): per-subspace
   * codebooks (m × ksub × (dim/m) doubles, driver-side tiny) plus the
   * corpus ENCODED to (neighbor_id, codes: array<int> of length m) — the
   * third point of the ANN quantization triad next to LSH (random
   * hyperplanes) and IVF (coarse cells). What PQ buys that the other two
   * don't: the candidate scan carries m small ints per corpus row instead
   * of the dim-float embedding (64× smaller at dim 64 / m 4), so the
   * approximate scoring pass is bounded by CODE-table IO, not
   * embedding-table IO — the difference that matters when the embedding
   * table is the 100 TB object and the code table fits warm storage. The
   * encoded frame persists in the INDEX cache registry (the IvfIndex
   * lifecycle contract — survives per-query drains, tracked for hygiene).
   */
  final case class PqIndex(codebooks: Seq[Seq[Seq[Double]]], encoded: DataFrame) {
    def release(blocking: Boolean = false): Unit =
      Caches.releaseIndex(encoded, blocking)
  }

  /**
   * Fit PQ codebooks and encode the corpus. The fit is [[lloyd]] run
   * INDEPENDENTLY per subspace over the SAME bounded hash-ordered sample
   * as the IVF build (one TakeOrdered scan, m driver-side k-means); the
   * encode is one narrow full-corpus map — per subspace, the nearest
   * sub-centroid via the same [[graft.expressions.NearestCells]]
   * expression as IVF assignment (`slice` carves the subvector natively;
   * no UDF/HOF anywhere), so assignment determinism and null semantics
   * (malformed vector → null code → null ADC score → dropped) are
   * inherited rather than re-implemented.
   */
  def buildPqIndex(corpus: DataFrame, m: Int = 4, ksub: Int = 16,
      sampleSize: Int = 2048, iterations: Int = 10): PqIndex = {
    val sample = sampleVectors(corpus, sampleSize)
    require(sample.nonEmpty, "buildPqIndex: empty corpus")
    val dim = sample.head.length
    require(m >= 1 && dim % m == 0,
      s"buildPqIndex: dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      val subSample =
        sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      lloyd(subSample, ksub, iterations).map(_.toSeq).toSeq
    }
    val codeCols = (0 until m).map { mi =>
      element_at(
        nearestCells(slice(col("embedding"), mi * sub + 1, sub),
          codebooks(mi), 1), 1)
    }
    val encoded = Caches.persistIndex(corpus
      .select(col("vec_id").as("neighbor_id"), array(codeCols: _*).as("codes")))
    PqIndex(codebooks, encoded)
  }

  /**
   * PQ approximate top-k: scan the CODES (never the corpus embeddings)
   * scoring every candidate with the native asymmetric distance
   * [[graft.expressions.PqAdcDistance]], keep a per-query SHORTLIST via
   * the bounded partial-agg TopK (score = −distance² — smaller is
   * better), then exact-rescore only the shortlist: the corpus embedding
   * table is touched for Q × shortlist rows via a BROADCAST of the
   * shortlist pairs (the big side streams, nothing data-sized shuffles).
   * Recall is governed by `shortlist` (L ≥ k; L = corpus size degenerates
   * to exact brute force — the certification point `ann_topk_pq_exact`
   * uses, the ivf_exact pattern); the operating point trades L for the
   * 64×-thinner approximate scan.
   */
  /**
   * IVF-PQ index: coarse cell assignment AND per-subspace PQ codes in ONE
   * encoded table — the composition behind the workhorse large-scale ANN
   * index (Jégou et al. 2011's IVFADC shape): the inverted file prunes
   * WHICH candidates are scored (nProbe/nCells of the corpus), PQ prunes
   * WHAT is read to score them (m small ints per row, never the
   * embedding). Fit shares ONE bounded hash-ordered sample between both
   * quantizers (one TakeOrdered scan); encode is one narrow full-corpus
   * map through the same [[graft.expressions.NearestCells]] expression as
   * both parent tiers.
   *
   * Codes are over RAW vectors, not per-cell residuals: residual encoding
   * (classic IVFADC) buys finer quantization but needs a per-(query,
   * probed-cell) ADC table — nProbe × m × ksub lookups per query — and
   * makes the exact-point certification below impossible (residual codes
   * can't be scored without the cell join). The raw-vector form keeps ADC
   * a single per-query table and inherits PQ's certified arithmetic
   * unchanged — the documented trade.
   */
  final case class IvfPqIndex(centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], encoded: DataFrame) {
    def release(blocking: Boolean = false): Unit =
      Caches.releaseIndex(encoded, blocking)
  }

  def buildIvfPqIndex(corpus: DataFrame, nCells: Int = 16, m: Int = 4,
      ksub: Int = 16, sampleSize: Int = 2048, iterations: Int = 10): IvfPqIndex = {
    val sample = sampleVectors(corpus, sampleSize)
    require(sample.nonEmpty, "buildIvfPqIndex: empty corpus")
    val dim = sample.head.length
    require(m >= 1 && dim % m == 0,
      s"buildIvfPqIndex: dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val centroids: Seq[Seq[Double]] =
      lloyd(sample, nCells, iterations).map(_.toSeq).toSeq
    val codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      val subSample =
        sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      lloyd(subSample, ksub, iterations).map(_.toSeq).toSeq
    }
    val codeCols = (0 until m).map { mi =>
      element_at(
        nearestCells(slice(col("embedding"), mi * sub + 1, sub),
          codebooks(mi), 1), 1)
    }
    val encoded = Caches.persistIndex(corpus
      .select(col("vec_id").as("neighbor_id"),
        element_at(nearestCells(col("embedding"), centroids, 1), 1).as("cell"),
        array(codeCols: _*).as("codes")))
    IvfPqIndex(centroids, codebooks, encoded)
  }

  /**
   * IVF-PQ approximate top-k: probe `nProbe` cells (the IVF candidate
   * prune — the only shuffle, keyed by the small cell int), ADC-score the
   * probed cells' CODES (the PQ read prune — never the embedding table),
   * keep a per-query `shortlist` via the bounded partial-agg TopK, then
   * exact-rescore only the shortlist against the corpus. Cost per query ≈
   * (nProbe/nCells)·N code reads + shortlist embedding reads — each
   * factor independently tunable, which is why this shape IS the standard
   * billion-vector serving index.
   *
   * Certification (the ivf_exact/pq_exact pattern, composed): at
   * nProbe = nCells AND shortlist ≥ corpus size, every vector is probed
   * (each lives in exactly one cell), the shortlist keeps everything, and
   * the rescore is exact cosine — ≡ brute force, so the whole composed
   * machinery (shared-sample double fit, fused encode, cell join, ADC
   * shortlist, broadcast rescore) is oracle-checkable (`ann_topk_ivfpq_
   * exact`); the operating point (`ann_topk_ivfpq`) is what's benched.
   */
  def ivfPqTopK(queries: DataFrame, index: IvfPqIndex, corpus: DataFrame,
      k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"ivfPqTopK: shortlist $shortlist must be ≥ k=$k")
    val p = math.min(nProbe, index.centroids.size)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val probes = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(nearestCells(col("embedding"), index.centroids, p)).as("cell"))
    // no pair dedup: a corpus vector lives in exactly one cell and a query
    // probes distinct cells (the ivfTopK argument)
    val short = index.encoded
      .join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        VectorFunctions.pqAdc(col("q_emb"), col("codes"), index.codebooks))
      .filter(col("adc").isNotNull)
      .groupBy("query_id")
      .agg(TopK.topK(shortlist)(col("neighbor_id"), -col("adc")).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("s"))
      .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"))
    val pairs = short.join(broadcast(q), "query_id")
    val cand = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(pairs), "neighbor_id")
    rescoreTopK(cand, k)
  }

  def pqTopK(queries: DataFrame, index: PqIndex, corpus: DataFrame, k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"pqTopK: shortlist $shortlist must be ≥ k=$k")
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val short = index.encoded
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        VectorFunctions.pqAdc(col("q_emb"), col("codes"), index.codebooks))
      .filter(col("adc").isNotNull)
      .groupBy("query_id")
      .agg(TopK.topK(shortlist)(col("neighbor_id"), -col("adc")).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("s"))
      .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"))
    val pairs = short.join(broadcast(q), "query_id")
    val cand = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(pairs), "neighbor_id")
    rescoreTopK(cand, k)
  }

  /**
   * A fitted SCALAR-QUANTIZATION index (SQ8, the FAISS
   * ScalarQuantizer shape): per-dimension affine int8 codes
   * c_i = ⌊(v_i − mn_i)·255/(mx_i − mn_i)⌋ over the corpus-wide
   * per-dimension [mn, mx] range — the fourth point of the ANN
   * quantization family next to LSH (hyperplanes), IVF (coarse cells)
   * and PQ (sub-codebooks). What SQ buys: a 4× thinner scan (one small
   * int per dim instead of a float) with NO trained codebook — the fit
   * is two exact order-independent aggregates (min/max), so unlike every
   * k-means-fitted family the ENTIRE operating point is deterministic
   * and oracle-certifiable as-is: quantization is a fixed per-element
   * expression over plan-constant ranges, and the squared code distance
   * is all-integer (|c_q − c_v| ≤ 255 ⇒ the 64-dim sum < 2²³ — exact
   * BIGINT in any engine). No exact sibling row is needed; the
   * certification IS the operating point (recall vs true cosine is the
   * measured trade, not a correctness property).
   *
   * Scale shape: the fit is one narrow full-corpus aggregate (2·dim
   * floats to the driver, baked as plan constants); the encode is one
   * codegen'd scan (unrolled per-dim arithmetic — no HOF, the PlanSpec
   * bar); the code table persists in the index registry (build once,
   * probe many). mins/maxs are EXACT selections (not sums) — any
   * partition order yields the same floats, the determinism min/max buy
   * that a trained quantizer can't.
   */
  final case class SqIndex(mins: Seq[Double], maxs: Seq[Double],
      encoded: DataFrame) {
    def release(blocking: Boolean = false): Unit =
      Caches.releaseIndex(encoded, blocking)
  }

  /** Per-dim SQ8 code columns over `embedding`, unrolled (no HOF):
    * least(floor((v − mn)·255/(mx − mn)), 255) as BIGINT; a constant
    * dimension (mx = mn) codes to 0 — the branch is plan-time (mins and
    * maxs are driver constants) but spelled as a runtime CASE in the
    * oracle, which evaluates identically on the same exact aggregates.
    * Inputs ≥ mn by construction (codes are only taken of corpus rows /
    * corpus-drawn queries), so no lower clamp is needed. */
  private def sqCodeCols(mins: Seq[Double], maxs: Seq[Double]): Seq[Column] =
    mins.indices.map { i =>
      val (mn, mx) = (mins(i), maxs(i))
      if (mx > mn)
        least(floor((element_at(col("embedding"), i + 1).cast("double")
            - lit(mn)) * lit(255.0) / lit(mx - mn)), lit(255L))
      else lit(0L)
    }

  def buildSqIndex(corpus: DataFrame, dim: Int = 64): SqIndex = {
    val aggs = (0 until dim).flatMap { i =>
      Seq(min(element_at(col("embedding"), i + 1).cast("double")).as(s"mn$i"),
        max(element_at(col("embedding"), i + 1).cast("double")).as(s"mx$i"))
    }
    // one bounded driver collect: 2·dim doubles (the centroid pattern)
    val row = corpus.agg(aggs.head, aggs.tail: _*).collect()(0)
    // min() over zero rows (or an all-null embedding column) aggregates
    // to NULL — fail with a real message instead of getDouble's bare NPE
    // (the diameterLowerBound empty-frame convention)
    require(!row.isNullAt(0),
      "buildSqIndex: empty corpus (or all-null embeddings) — no ranges to fit")
    val mins = (0 until dim).map(i => row.getDouble(2 * i))
    val maxs = (0 until dim).map(i => row.getDouble(2 * i + 1))
    val encoded = Caches.persistIndex(corpus
      .select(col("vec_id").as("neighbor_id"),
        array(sqCodeCols(mins, maxs): _*).as("codes")))
    SqIndex(mins, maxs, encoded)
  }

  /**
   * SQ8 top-k: quantize the query batch with the index's plan-constant
   * ranges, scan the CODE table (never the embeddings) scoring every
   * candidate with the unrolled all-integer squared code distance, keep
   * per-query top-k under the total order (distance ASC, neighbor ASC).
   * Output: (query_id, rank, neighbor_id, qdist) — qdist the exact
   * integer distance, which is why the row is fully oracle-checkable at
   * its real operating point. Cost per query: one pass over the 4×
   * thinner code table, candidates partial-aggregated into the bounded
   * TopK — no shuffle carries anything data-sized.
   */
  def sqTopK(queries: DataFrame, index: SqIndex, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      array(sqCodeCols(index.mins, index.maxs): _*).as("qc"))
    val dist = index.mins.indices.map { i =>
      val d = element_at(col("qc"), i + 1) - element_at(col("codes"), i + 1)
      d * d
    }.reduce(_ + _)
    index.encoded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qdist", dist)
      .filter(col("qdist").isNotNull)
      .groupBy("query_id")
      // integer distances < 2²³ are exact doubles: the (−qdist, id) TopK
      // order IS (qdist ASC, neighbor_id ASC)
      .agg(TopK.topK(k)(col("neighbor_id"), (-col("qdist")).cast("double"))
        .as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.neighbor_id").as("neighbor_id"),
        (-col("s.cos")).cast("long").as("qdist"))
  }

  /**
   * PER-DIMENSION EMBEDDING PROFILE — (dim, mn, mx, mean): the vector
   * sanity dashboard a pipeline reads before any ANN/quantization work
   * (dead dimensions, range skew, centering drift) and the statistics
   * the SQ8 quantizer fits on. mn/mx are exact ORDER-INDEPENDENT
   * selections; the mean's numerator is a sum of doubles — order
   * sensitive — so it runs the deterministic TWO-LEVEL vec_id % 16
   * fold (the pagerank/kmeans pattern: sorted-fold within (dim,
   * bucket) by vec_id, sorted-fold the ≤16 bucket sums by bucket id,
   * ONE division by the exact integer count), which an oracle replays
   * bit-for-bit. This is the oracle-exact mode; a production profile
   * at 100 TB would swap the fold for a plain partial-aggregated
   * `avg()` exactly as [[pageRank]]'s `exact = false` does — same
   * documented trade.
   *
   * Scale shape: one posexplode scan (|corpus|·dim narrow rows), two
   * partial-aggregated groupBys keyed by (dim, bucket) then dim —
   * fold state bounded by |bucket| rows per key; output is dim rows.
   */
  def embeddingProfile(corpus: DataFrame): DataFrame = {
    val x = corpus
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("v").cast("double").as("v"))
    val l1 = x
      .groupBy(col("dim"), pmod(col("vec_id"), lit(16L)).as("bkt"))
      .agg(aggregate(sort_array(collect_list(struct(col("vec_id"), col("v")))),
        lit(0.0), (a, s) => a + s.getField("v")).as("bs"),
        min("v").as("bmn"), max("v").as("bmx"), count(lit(1)).as("bn"))
    l1.groupBy("dim")
      .agg(aggregate(sort_array(collect_list(struct(col("bkt"), col("bs")))),
        lit(0.0), (a, s) => a + s.getField("bs")).as("s"),
        min("bmn").as("mn"), max("bmx").as("mx"), sum("bn").as("n"))
      .select(col("dim"), col("mn"), col("mx"),
        (col("s") / col("n").cast("double")).as("mean"))
  }

  /** Driver-side twin of the assignment loop inside [[lloyd]] (and of
    * [[graft.expressions.NearestCells]]' semantics at nProbe = 1):
    * left-to-right Σ(x−c)² fold, strict-< keeps the lowest index on ties.
    * Used only on the bounded fit sample to compute residuals. */
  private def nearestIdx(v: Array[Double], centroids: Seq[Seq[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var s = 0.0; var j = 0
      while (j < v.length) { val d = v(j) - cen(j); s += d * d; j += 1 }
      if (s < bestD) { best = c; bestD = s }
      c += 1
    }
    best
  }

  /**
   * RESIDUAL-coded IVF-PQ (the classic IVFADC of Jégou et al. 2011 §IV-A,
   * completing [[IvfPqIndex]]'s documented raw-vector trade): codes
   * quantize the residual v − centroid(cell) instead of v itself.
   * Residuals within a cell are small and centered, so the same m × ksub
   * code budget spends its resolution on the part of v the coarse
   * quantizer didn't already explain — the recall-per-byte step that
   * makes residual coding the production IVFADC default.
   *
   * Implementation — SHIFTED CODEBOOKS, not per-row residual arithmetic:
   * for cell c the stored codebook entry is b + centroid(c)|sub, because
   * ‖v − (b + c)‖ = ‖(v − c) − b‖ — nearest-residual-code of (v − c) over
   * the residual codebook IS nearest-shifted-code of raw v. Both the
   * encode ([[graft.expressions.NearestCells]]) and the query-side ADC
   * ([[graft.expressions.PqAdcDistance]]) therefore reuse the existing
   * native expressions UNCHANGED, dispatched by a plan-constant CASE over
   * the nCells cell ids (lazy branches — one codebook evaluated per row,
   * no HOF/lambdafunction anywhere, the PlanSpec bar). `cellCodebooks(c)`
   * is the per-cell shifted table; nCells × m × ksub × sub doubles
   * (~128 KB at 16×8×16×8) baked into the plan like every other
   * quantizer constant.
   *
   * Certification: the exact point (nProbe = nCells, shortlist ≥ corpus)
   * is ≡ brute force exactly as [[ivfPqTopK]] — the rescore is exact
   * cosine over everything — so the residual composition gets its own
   * oracle row (`ann_topk_ivfpq_res_exact`) despite the per-cell ADC
   * tables that make residual codes impossible to score WITHOUT the cell
   * context (the reason the raw-vector variant existed first).
   */
  final case class IvfPqResIndex(centroids: Seq[Seq[Double]],
      cellCodebooks: Seq[Seq[Seq[Seq[Double]]]], encoded: DataFrame) {
    def release(blocking: Boolean = false): Unit =
      Caches.releaseIndex(encoded, blocking)
  }

  def buildIvfPqResIndex(corpus: DataFrame, nCells: Int = 16, m: Int = 4,
      ksub: Int = 16, sampleSize: Int = 2048, iterations: Int = 10): IvfPqResIndex = {
    val sample = sampleVectors(corpus, sampleSize)
    require(sample.nonEmpty, "buildIvfPqResIndex: empty corpus")
    val dim = sample.head.length
    require(m >= 1 && dim % m == 0,
      s"buildIvfPqResIndex: dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    val centroids: Seq[Seq[Double]] =
      lloyd(sample, nCells, iterations).map(_.toSeq).toSeq
    // fit the sub-quantizers on the sample's RESIDUALS (assignment via the
    // same fold the distributed NearestCells applies corpus-side)
    val residuals = sample.map { v =>
      val cen = centroids(nearestIdx(v, centroids))
      Array.tabulate(dim)(i => v(i) - cen(i))
    }
    val rcb: Seq[Seq[Seq[Double]]] = (0 until m).map { mi =>
      val subSample =
        residuals.map(r => java.util.Arrays.copyOfRange(r, mi * sub, (mi + 1) * sub))
      lloyd(subSample, ksub, iterations).map(_.toSeq).toSeq
    }
    // shift: cell c, subspace mi, entry j ↦ rcb + centroid-slice
    val cellCodebooks: Seq[Seq[Seq[Seq[Double]]]] = centroids.map { cen =>
      (0 until m).map { mi =>
        rcb(mi).map(b => Seq.tabulate(sub)(i => b(i) + cen(mi * sub + i)))
      }
    }
    val withCell = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding"),
      element_at(nearestCells(col("embedding"), centroids, 1), 1).as("cell"))
    val codeCols = (0 until m).map { mi =>
      val sv = slice(col("embedding"), mi * sub + 1, sub)
      // plan-constant CASE over cells (centroids.indices — lloyd may return
      // fewer than nCells on a tiny sample); null cell (malformed vector)
      // falls through to the null otherwise → null code → null ADC → dropped
      centroids.indices.foldLeft(lit(null).cast("int")) { (acc, c) =>
        when(col("cell") === c,
          element_at(nearestCells(sv, cellCodebooks(c)(mi), 1), 1))
          .otherwise(acc)
      }
    }
    val encoded = Caches.persistIndex(withCell
      .select(col("neighbor_id"), col("cell"), array(codeCols: _*).as("codes")))
    IvfPqResIndex(centroids, cellCodebooks, encoded)
  }

  /** Residual-coded IVF-PQ top-k: identical plan shape to [[ivfPqTopK]]
    * (cell-join candidate prune → ADC shortlist over codes → broadcast
    * exact rescore); only the ADC column differs — a plan-constant CASE
    * over the probed cell selects that cell's shifted codebook, which is
    * exactly the per-(query, cell) ADC table of classic IVFADC. */
  def ivfPqResTopK(queries: DataFrame, index: IvfPqResIndex, corpus: DataFrame,
      k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"ivfPqResTopK: shortlist $shortlist must be ≥ k=$k")
    val p = math.min(nProbe, index.centroids.size)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val probes = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(nearestCells(col("embedding"), index.centroids, p)).as("cell"))
    val adc = index.cellCodebooks.indices
      .foldLeft(lit(null).cast("double")) { (acc, c) =>
        when(col("cell") === c,
          VectorFunctions.pqAdc(col("q_emb"), col("codes"),
            index.cellCodebooks(c)))
          .otherwise(acc)
      }
    val short = index.encoded
      .join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adc)
      .filter(col("adc").isNotNull)
      .groupBy("query_id")
      .agg(TopK.topK(shortlist)(col("neighbor_id"), -col("adc")).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("s"))
      .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"))
    val pairs = short.join(broadcast(q), "query_id")
    val cand = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(pairs), "neighbor_id")
    rescoreTopK(cand, k)
  }

  /**
   * SEMANTIC DEDUPLICATION (SemDeDup, Abbas et al. 2023,
   * arXiv:2303.09540): cluster the corpus in embedding space, find
   * near-duplicate GROUPS only within clusters, and keep one
   * representative per group. The pairwise cosine work is bounded per
   * cluster — Σ|cell|² instead of the global N² — which is the paper's
   * entire scale argument: at 100 TB you run k ≈ 10⁵ clusters (the paper
   * uses 50k on LAION) and the quadratic never sees more than a cell.
   * Here the cells come from caller-supplied plan-constant centroids
   * (the certified [[assignCells]] arithmetic), so cell count is the one
   * knob between this test-scale configuration and the production one.
   *
   * Semantics, all deterministic so a SQL oracle can replay them with NO
   * separation assumption (the full algorithm is mirrored op-for-op):
   *  1. cell(v) = argmin squared-L2 centroid ([[NearestCells]]' total
   *     order — float→double widening, lowest index on ties);
   *  2. duplicate pairs = within-cell pairs with cosine ≥ `threshold`
   *     (native [[graft.expressions.CosineSimilarity]], certified
   *     bit-equal to DuckDB's list_cosine_similarity by the ann rows);
   *  3. duplicate groups = connected components of the pair graph
   *     ([[Dedup.duplicateClusters]]' pointer-jumping union-find —
   *     components cannot span cells, pairs never do);
   *  4. keeper per group = the member with the LOWEST cosine to its own
   *     cell centroid (the paper's keep-least-prototypical rule — the
   *     most central member is the most redundant with the rest of the
   *     cluster), ties to the smallest vec_id — a total order.
   *
   * Scale shape: assignment is one shuffle-free codegen'd scan (centroids
   * are plan constants); the pair join is an equi-join on `cell` (the
   * shuffle key a small int — never a cartesian); the component loop is
   * sized to the PAIR GRAPH, not the corpus; keeper selection is a
   * partial-aggregated min_by under the (centroid_cos, vec_id) struct
   * order — never a window; centroid cosines are computed only for
   * GROUP MEMBERS (pair-graph nodes, usually ≪ corpus) via a broadcast
   * of the k-row centroid table. Nothing data-sized touches the driver.
   *
   * Returns (dropped_id, kept_id): one row per removed member, pointing
   * at its group's surviving representative. Callers anti-join
   * `dropped_id` against the corpus for the surviving set. The persisted
   * assignment intermediate is registered with [[Caches]] — release via
   * `Caches.releaseAll()` after materializing.
   */
  def semanticDedup(corpus: DataFrame, centroids: Seq[Seq[Double]],
      threshold: Double, loopParts: Int = 0,
      localPairsCap: Long = 0L): DataFrame = {
    // one assignment scan feeds the pair join (twice) and the member
    // re-read — persist it or the codegen'd argmin runs three times
    val assigned = Caches.persistTracked(corpus.select(
      col("vec_id").cast("long").as("vec_id"), col("embedding"),
      element_at(nearestCells(col("embedding"), centroids, 1), 1)
        .cast("long").as("cell")))
    val pairs = assigned
      .select(col("cell"), col("vec_id").as("doc_a"), col("embedding").as("e_a"))
      .join(assigned.select(col("cell"), col("vec_id").as("doc_b"),
        col("embedding").as("e_b")), "cell")
      .filter(col("doc_a") < col("doc_b"))
      .filter(VectorFunctions.cosine(col("e_a"), col("e_b")) >= threshold)
      .select("doc_a", "doc_b")
    // groups of mutually-similar members (union-find; eager, owns its caches)
    val members = Dedup.duplicateClusters(pairs, loopParts = loopParts,
      localPairsCap = localPairsCap)
    // centroid table: k rows, broadcast — never a plan-constant CASE here
    // because members ≪ corpus makes the join side tiny anyway
    val spark = corpus.sparkSession
    val centDf = spark.createDataFrame(
      centroids.zipWithIndex.map { case (c, i) => (i.toLong, c) })
      .toDF("cell", "c_emb")
    val scored = members
      .join(assigned, members("doc_id") === assigned("vec_id"))
      .join(broadcast(centDf), "cell")
      .select(col("cluster"), col("vec_id"),
        VectorFunctions.cosine(col("embedding"), col("c_emb")).as("ccos"))
    // keeper order must be TOTAL on both engines even when ccos is NULL
    // (a zero-norm centroid → cosine NULL): Spark struct ordering sorts
    // NULL first while the DuckDB oracle's ORDER BY ccos, vec_id defaults
    // to NULLS LAST — coalescing NULL to +inf (unreachable for a real
    // cosine, which is ≤ 1) makes both engines rank null-ccos members
    // last with the same vec_id tie-break. Unreachable on corpus
    // embeddings (non-zero norms), so wired oracle hashes are unchanged.
    val keepers = scored
      .groupBy("cluster")
      .agg(min_by(col("vec_id"),
        struct(coalesce(col("ccos"), lit(Double.PositiveInfinity)),
          col("vec_id"))).as("kept_id"))
    scored.join(keepers, "cluster")
      .filter(col("vec_id") =!= col("kept_id"))
      .select(col("vec_id").as("dropped_id"), col("kept_id"))
  }
}
