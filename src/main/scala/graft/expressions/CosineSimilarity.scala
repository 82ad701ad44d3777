package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for cosine similarity over two numeric array
 * columns — the hot scalar of the similarity-search tier.
 *
 * Exists because the composable form (`aggregate(zip_with(...))`,
 * `VectorFunctions.cosine`) runs as interpreted higher-order functions:
 * every element costs a lambda dispatch plus an intermediate array
 * allocation. This expression generates a straight-line fused Java loop via
 * `doGenCode`, so a 64-dim cosine is ~100 multiply-adds inside whole-stage
 * codegen with zero allocations.
 *
 * Semantics are IDENTICAL to the HOF twin (asserted bit-for-bit in
 * `CosineSimilaritySpec`): element-wise promote to double, sequential
 * accumulation in array order (dot, then each norm), `dot /
 * (sqrt(na)·sqrt(nb))`; null array, length mismatch, null element, or a
 * zero-norm side → null (never NaN).
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = lt match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv = rt match {
        case FloatType => y.getFloat(i).toDouble
        case _ => y.getDouble(i)
      }
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val bad = ctx.freshName("bad")
      val av = CodeGenerator.getValue(a, elemType(left), i)
      val bv = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $xv = (double) $av;
         |    final double $yv = (double) $bv;
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |}
         |if ($bad || $na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
