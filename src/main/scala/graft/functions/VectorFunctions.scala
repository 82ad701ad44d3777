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

  /** Elementwise product then sum — `aggregate(zip_with(a,b,*), 0.0, +)`. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors (returns null
    * rather than NaN so filters drop them cleanly). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = sqrt(normSq(a))
    val nb = sqrt(normSq(b))
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(d / (na * nb))
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
   * prime 2^31-1 — reproducible across runs, no stored model, and all
   * arithmetic stays exact in Long (safe under Spark 4's default ANSI mode,
   * where silent 64-bit overflow would instead throw).
   */
  def hyperplaneSignature(vec: Column, nBits: Int, seed: Long): Column = {
    val M = 2147483647L // 2^31 - 1
    // pseudo-random ±1 weight for (bit b, dim i): low bit of (a_b·i + c_b) mod M
    def weight(b: Int, i: Column): Column = {
      val ab = (((seed % M + M) % M) * 40503L + b.toLong * 12289L + 1L) % M
      val cb = (((seed % M + M) % M) * 69069L + b.toLong * 30269L + 7L) % M
      val h = pmod(lit(ab) * i.cast("long") + lit(cb), lit(M))
      when(h.bitwiseAND(lit(1L)) === 0L, lit(-1.0)).otherwise(lit(1.0))
    }
    // projection of vec onto hyperplane b: sum_i w(b,i) * vec[i]
    def proj(b: Int): Column =
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x.cast("double") * weight(b, i)),
        lit(0.0),
        (acc, x) => acc + x)
    (0 until nBits)
      .map(b => when(proj(b) >= 0.0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
  }
}
