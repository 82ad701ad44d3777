package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native per-row 62-bit SimHash over a shingle-hash array (`array<long>`,
 * e.g. [[ShingleHashes]] output — multiplicity-weighted: duplicate shingles
 * vote once each): every element votes ±1 per bit of its hash on bits
 * 0..61; the signature packs the per-bit vote signs (sum > 0 → 1). The
 * exact arithmetic of `TextFunctions.simhashHof` and
 * `TextFunctions.simhashAgg` (bit-equality asserted in TextFunctionsSpec).
 *
 * Exists for the same reason as [[MinhashFromFeatures]]: the aggregate form
 * explodes every shingle hash and shuffles one row per doc to compute a
 * pure per-row function; this computes the signature in the scan stage with
 * zero shuffle. It also gives Structured Streaming a per-row signature —
 * streaming operators cannot run an explode+groupBy signature aggregation
 * per micro-batch without dragging a stateful aggregation into the plan.
 *
 * Twin parity: a null ELEMENT votes -1 on every bit (the twins'
 * `when(bit-test).otherwise(-1)` collapses null tests to the otherwise
 * branch); an empty array yields signature 0 (zero votes lose every
 * `sum > 0` test).
 */
case class SimhashFromHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_from_hashes expects array<long>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](62)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (arr.isNullAt(e)) {
        var b = 0
        while (b < 62) { votes(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(e)
        var b = 0
        while (b < 62) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      e += 1
    }
    var sig = 0L
    var b = 0
    while (b < 62) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashFromHashes =
    copy(child = newChild)
}
