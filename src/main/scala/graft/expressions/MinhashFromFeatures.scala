package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native per-row MinHash signature over an already-extracted feature array
 * (`array<long>`, e.g. [[ShingleHashes]] output or a hashed shingle SET):
 * `numHashes` running minima of the affine universal-hash family
 * h_i(x) = (a_i·pmod(xxhash64(x), M) + b_i) mod M, M = 2^31-1 — the exact
 * arithmetic of `TextFunctions.minhashFromFeaturesHof` and
 * `TextFunctions.minhashAgg` (bit-equality asserted in TextFunctionsSpec).
 *
 * Exists because the aggregate form — explode(features) → groupBy(doc) →
 * minhashAgg — pays an explode of every posting plus a one-row-per-doc
 * SHUFFLE just to compute a value that is a pure function of the row.
 * Per-row, the signature materializes in the scan stage: zero shuffle,
 * zero exploded intermediates, same codegen'd surroundings. The aggregate
 * twin remains for pipelines whose features are already one-per-row.
 *
 * Twin-parity details: null elements are skipped (the HOF's
 * `least(acc, null)` keeps the accumulator); an empty array yields the
 * all-M seed signature (the HOF's fold seed).
 */
case class MinhashFromFeatures(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, s"minhash: numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_from_features expects array<long>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_features"

  /** Mersenne prime 2^31-1 — matches TextFunctions.M. */
  private val M = 2147483647L

  @transient private lazy val laneA: Array[Long] =
    Array.tabulate(numHashes)(i => (2L * i + 1L) * 0x9E3779B9L % M)
  @transient private lazy val laneB: Array[Long] =
    Array.tabulate(numHashes)(i => (i + 1L) * 0x85EBCA77L % M)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(M)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        // mix through xxhash64 (seed 42, Spark's) then fold to [0, M) —
        // identical to pmod(xxhash64(x), M) in the column twins
        val y = java.lang.Math.floorMod(
          XxHash64Function.hash(arr.getLong(e), LongType, 42L), M)
        var i = 0
        while (i < numHashes) {
          val v = java.lang.Math.floorMod(laneA(i) * y + laneB(i), M)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashFromFeatures =
    copy(child = newChild)
}
