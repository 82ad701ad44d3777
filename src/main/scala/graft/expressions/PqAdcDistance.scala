package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `pq_adc(query_vec, codes)`: asymmetric product-quantization distance
 * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
 * TPAMI 2011) — the squared L2 distance between a RAW query vector and a
 * CODED corpus vector reconstructed from its per-subspace centroid ids:
 * Σ_m ‖q[m·s..(m+1)·s) − C_m[codes[m]]‖². The codebooks (M × ksub × s
 * doubles — a few KB) are a PLAN-TIME constant baked into the expression,
 * broadcast to executors inside the serialized plan exactly like
 * [[NearestCells]]' centroid matrix.
 *
 * Why this exists (the 100 TB shape): the PQ candidate scan reads only
 * (id, M small ints) per corpus row — dim·4 bytes of embedding shrink to
 * M bytes of codes (64× at dim 64 / M 4), which is the difference between
 * an ANN shortlist scan that fits the page cache and one that re-reads
 * the embedding table. Per-pair FLOPs match the exact distance (a
 * columnar engine has no per-query LUT row-reuse the way a hand-rolled
 * ADC scan does — that variant would be a `mapPartitions` escape, traded
 * away here for staying inside Catalyst); the win is memory/IO, which is
 * what bounds a shortlist scan at corpus scale.
 *
 * Null semantics (the [[CosineSimilarity]] contract): null codes array,
 * wrong query dim, wrong code count, null / out-of-range code, or null
 * query element → null, never a throw or NaN.
 *
 * CodegenFallback: per-row work IS the M·s multiply-add loop; dispatch
 * overhead is noise (the NearestCells precedent).
 */
case class PqAdcDistance(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with CodegenFallback {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_adc: codebooks must be non-empty")
  require(codebooks.forall(b => b.forall(_.size == b.head.size)),
    "pq_adc: centroids within a subspace must share a dimension")

  private def okVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def okCodes(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okVec(left.dataType) && okCodes(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<float|double>, array<int>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  @transient private lazy val m: Int = codebooks.size
  @transient private lazy val subDims: Array[Int] =
    codebooks.map(_.head.size).toArray
  @transient private lazy val dim: Int = subDims.sum
  // per subspace: flattened row-major centroid matrix (ksub × subDim)
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map(_.flatten.toArray).toArray
  @transient private lazy val kSub: Array[Int] = codebooks.map(_.size).toArray

  override def nullSafeEval(q: Any, c: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    if (qv.numElements() != dim || codes.numElements() != m) return null
    val isFloat =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var total = 0.0
    var off = 0
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val code = codes.getInt(mi)
      if (code < 0 || code >= kSub(mi)) return null
      val s = subDims(mi)
      val base = code * s
      val cb = flat(mi)
      var j = 0
      while (j < s) {
        if (qv.isNullAt(off + j)) return null
        val x =
          if (isFloat) qv.getFloat(off + j).toDouble
          else qv.getDouble(off + j)
        val d = x - cb(base + j)
        total += d * d
        j += 1
      }
      off += s
      mi += 1
    }
    total
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}
