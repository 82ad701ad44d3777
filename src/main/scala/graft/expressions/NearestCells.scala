package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `nearest_cells(vec)`: the `nProbe` coarse-quantizer cells nearest to a
 * vector, by squared L2 distance, nearest first (ties by cell index
 * ascending — deterministic). The centroid matrix is a PLAN-TIME constant
 * baked into the expression — the IVF quantizer is fit once on a bounded
 * sample and then broadcast to every executor as part of the serialized
 * plan, so per row this is a pure `nCells × dim` multiply-add loop with no
 * shuffle, no model lookup, and no Catalyst array intermediates.
 *
 * With `nProbe = 1` this is the corpus-side cell ASSIGNMENT; with
 * `nProbe = p` it is the query-side multi-probe. Using the same expression
 * for both sides guarantees assignment ≡ probe ordering (a vector's own
 * cell is always its first probe — the self-recall property
 * SimilaritySpec pins).
 *
 * CodegenFallback: evaluated once per row; the internal loop IS the work
 * (~nCells·dim flops), so codegen'ing the dispatch would buy nothing.
 */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]],
    nProbe: Int) extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "nearest_cells: centroids must be non-empty")
  require(nProbe >= 1 && nProbe <= centroids.size,
    s"nearest_cells: nProbe must be in [1, ${centroids.size}], got $nProbe")

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // nullSafeEval returns null for dim-mismatched or null-element vectors even
  // when the input column is non-nullable — without this override a
  // non-nullable input would make consumers skip the null check entirely
  // (same contract as HyperplaneSignature)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  // flattened row-major copy so eval touches a primitive array, not Seq boxing
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  @transient private lazy val dim: Int = centroids.head.size

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null // dim mismatch: no meaningful cell
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val nCells = centroids.size
    val d2 = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var j = 0
      val base = c * dim
      while (j < dim) {
        val d = x(j) - flat(base + j)
        s += d * d
        j += 1
      }
      d2(c) = s
      c += 1
    }
    // partial selection of nProbe smallest (nCells is small; O(nCells·nProbe))
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](nCells)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < nCells) {
        if (!taken(c) && d2(c) < bestD) { best = c; bestD = d2(c) }
        c += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
