package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Dense-vector math over `ArrayType(FloatType/DoubleType)` columns, built
 * entirely from Spark's higher-order functions so every expression stays
 * inside Catalyst (codegen'd, no UDF serialization, pushdown-transparent).
 *
 * The reference has no vector ops (SURVEY.md §2.14); these power the
 * similarity-search extension tier. Computation is promoted to Double to
 * match the DuckDB oracle's `list_cosine_similarity(CAST(... AS DOUBLE[]))`.
 */
object VectorFunctions {

  /**
   * Split a packed signature long into `bands` contiguous band values for
   * LSH bucketing: `posexplode` over Scala-built shifts (exact integer
   * arithmetic, codegen-friendly). Emits columns (band, band_val) when
   * aliased via `.as(Seq("band", "band_val"))` by the caller.
   */
  def lshBands(sig: Column, bands: Int, bits: Int): Column = {
    val mask = (1L << bits) - 1L
    posexplode(array((0 until bands).map(b =>
      shiftright(sig, b * bits).bitwiseAND(lit(mask))): _*))
  }

  /** Blockhash (aHash-family) content signature over a BINARY payload as
    * `blocks / bandBits` per-band longs, via the native
    * [[graft.expressions.BlockhashBands]] loop (bit-equality vs its
    * plain-Scala reference asserted in MultimodalSpec). Engine-portable
    * integer math end to end — the `dedup_phash` oracle recomputes it
    * op-for-op in SQL. */
  def blockhashBands(payload: Column, blocks: Int, bandBits: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.BlockhashBands(
      ColumnBridge.expression(payload), blocks, bandBits))
  }

  /** Elementwise product then sum — `aggregate(zip_with(a,b,*), 0.0, +)`. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors (returns null
    * rather than NaN so filters drop them cleanly). Composable HOF form —
    * see [[cosine]]'s native twin for the hot-path version. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(normSq(a))
    val nb = sqrt(normSq(b))
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(d / (na * nb))
  }

  /**
   * Cosine similarity via the native codegen'd Catalyst expression
   * [[graft.expressions.CosineSimilarity]] — bit-identical semantics to
   * [[cosineHof]] (asserted in `CosineSimilaritySpec`) at a fraction of the
   * cost: a fused generated loop instead of interpreted higher-order
   * functions with per-element lambda dispatch. This is what the similarity
   * and embedding-dedup operators use.
   */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Deterministic in-order double sum of struct field `ordinal` over an
    * array, via the native [[graft.expressions.ArrayFieldSum]] — the
    * codegen twin of `aggregate(arr, 0.0, (acc, x) => acc + x.getField(f))`
    * (bit-identical, asserted in ArrayFieldSumSpec): same sequential IEEE
    * adds in array order, same null propagation. Swap-in replacement for
    * the interpreted HOF in every sorted-fold hot path (pagerank/HITS
    * exact contribution folds, tf-idf dots). */
  def fieldSum(arr: Column, ordinal: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.ArrayFieldSum(
      ColumnBridge.expression(arr), ordinal, squared = false))
  }

  /** [[fieldSum]] folding acc + v·v — the tf-idf norm shape
    * (`acc + x.getField(f) * x.getField(f)`), same bit-identity twin
    * argument. */
  def fieldSumSq(arr: Column, ordinal: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.ArrayFieldSum(
      ColumnBridge.expression(arr), ordinal, squared = true))
  }

  /** [[fieldSum]] over a plain array<double> (ordinal -1): the native
    * twin of `aggregate(arr, 0.0, (acc, x) => acc + x)`. */
  def elemSum(arr: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.ArrayFieldSum(
      ColumnBridge.expression(arr), -1, squared = false))
  }

  /** Asymmetric product-quantization distance via the native
    * [[graft.expressions.PqAdcDistance]] — squared L2 between a raw query
    * vector and a coded corpus vector reconstructed from the plan-constant
    * codebooks (see the expression's scaladoc for the 100 TB IO story). */
  def pqAdc(queryVec: Column, codes: Column,
      codebooks: Seq[Seq[Seq[Double]]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.PqAdcDistance(
      ColumnBridge.expression(queryVec), ColumnBridge.expression(codes),
      codebooks))
  }

  /** Squared L2 distance (cheaper than sqrt when only ordering matters). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dxy = x.cast("double") - y.cast("double")
        dxy * dxy
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /**
   * Random-hyperplane (SimHash) signature for cosine LSH: `nBits` sign bits
   * packed into a long. Hyperplane weights are ±1, derived deterministically
   * from (seed, bitIndex, dimension) by a universal hash mod the Mersenne
   * prime 2^31-1 — reproducible across runs, no stored model.
   *
   * `dim` (the embedding dimensionality) is a plan-time parameter so the
   * weight matrix is computed ONCE at plan time and embedded as literal
   * arrays — per row the projection is a pure multiply-add over the vector.
   * (Deriving weights per (row, bit, dim) with in-plan hash expressions
   * measured ~10× slower: the hash arithmetic re-ran for every element of
   * every row.)
   */
  /** Pseudo-random ±1 weight for (bit b, dim i): low bit of a splitmix64
    * finalizer over (seed, b, i). A full-avalanche mix matters: the low bit
    * of a LINEAR hash (a·i+c mod p) is just the parity of a±i — every
    * hyperplane degenerates to the same alternating pattern and all
    * signatures collapse into a handful of buckets (measured: 20k vectors
    * → 8 distinct band values). */
  private def hyperplaneWeight(seed: Long, b: Int, i: Int): Double = {
    var z = seed + b.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) -1.0 else 1.0
  }

  private def hyperplaneWeights(nBits: Int, seed: Long, dim: Int): Seq[Seq[Double]] =
    (0 until nBits).map(b => (0 until dim).map(i => hyperplaneWeight(seed, b, i)))

  /**
   * Hyperplane signature via the native fused-loop Catalyst expression
   * [[graft.expressions.HyperplaneSignature]] — bit-identical to
   * [[hyperplaneSignatureHof]] (asserted in HyperplaneSignatureSpec) at one
   * nBits × dim multiply-add loop per row instead of nBits interpreted
   * `aggregate(zip_with(...))` passes. This is what the LSH ANN and
   * embedding-dedup operators use.
   */
  def hyperplaneSignature(vec: Column, nBits: Int, seed: Long, dim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.expressions.HyperplaneSignature(
      ColumnBridge.expression(vec), hyperplaneWeights(nBits, seed, dim)))
  }

  /** Composable HOF reference twin of [[hyperplaneSignature]] (the semantic
    * spec the native expression is asserted against). */
  def hyperplaneSignatureHof(vec: Column, nBits: Int, seed: Long, dim: Int): Column = {
    // projection of vec onto hyperplane b: sum_i w(b,i) * vec[i]
    def proj(b: Int): Column = {
      val w = typedLit((0 until dim).map(i => hyperplaneWeight(seed, b, i)))
      aggregate(
        zip_with(vec, w, (x, wi) => x.cast("double") * wi),
        lit(0.0),
        (acc, x) => acc + x)
    }
    val sig = (0 until nBits)
      .map(b => when(proj(b) >= 0.0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    // Fail loudly on a dim mismatch: zip_with would null-pad, null the
    // projections, and the when/otherwise above would silently emit
    // signature 0 for EVERY row — collapsing all vectors into one LSH
    // bucket and degenerating the candidate join to all-pairs.
    coalesce(
      assert_true(size(vec) === lit(dim),
        lit(s"hyperplaneSignature: vector length != dim=$dim")).cast("long"),
      sig)
  }
}
