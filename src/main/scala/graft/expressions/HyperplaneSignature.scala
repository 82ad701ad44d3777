package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native random-hyperplane (cosine-LSH) signature: bit b of the result is
 * the sign of `vec · w_b`, for a ±1 weight matrix fixed at plan time.
 *
 * Semantics are identical to the composable HOF twin
 * (`VectorFunctions.hyperplaneSignatureHof`, asserted bit-for-bit in
 * HyperplaneSignatureSpec): per bit, promote elements to double and
 * accumulate in array order, bit set iff the projection is >= 0; a
 * dimension mismatch THROWS (the HOF twin's assert_true — a silent zero
 * signature would funnel every malformed vector into one LSH bucket); a
 * null ELEMENT nulls each projection, leaving every bit unset (sig 0),
 * exactly as null-propagation does in the HOF. The HOF twin pays nBits
 * interpreted `aggregate(zip_with(...))` passes per row (nBits × dim
 * lambda dispatches + nBits intermediate arrays); this is one fused
 * native loop.
 *
 * CodegenFallback: evaluated once per row; the nBits × dim multiply-add
 * loop IS the work.
 */
case class HyperplaneSignature(child: Expression, weights: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  require(weights.nonEmpty && weights.size <= 64,
    s"hyperplane_signature: need 1..64 hyperplanes, got ${weights.size}")

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_signature"

  @transient private lazy val flat: Array[Double] = weights.flatten.toArray
  @transient private lazy val dim: Int = weights.head.size
  @transient private lazy val nBits: Int = weights.size

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_signature: vector length ${v.numElements()} != dim=$dim")
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return 0L // null element nulls every projection
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0
      var j = 0
      val base = b * dim
      while (j < dim) { s += x(j) * flat(base + j); j += 1 }
      if (s >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}
