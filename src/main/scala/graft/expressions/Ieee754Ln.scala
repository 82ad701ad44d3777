package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Natural log through `java.lang.Math.log` — NOT Spark's built-in
 * `log()`, which routes to `java.lang.StrictMath.log` (fdlibm, a 2-ulp
 * implementation). HotSpot's `Math.log` intrinsic (the software
 * `StubRoutines::dlog` polynomial, used consistently by the
 * interpreter, C1 and C2, and by every x86-64 JVM in this toolchain)
 * empirically produces the SAME bits as glibc's `log` — which is what
 * DuckDB (and CPython) call — on every argument this engine feeds it,
 * where fdlibm was measured to differ in the last ulp on ~1% of the
 * DSIR per-bucket probability ratios (8 of 639 at sf0.01). Queries
 * whose oracles replay an `ln` op-for-op use THIS expression so both
 * engines evaluate the same function of the same bits.
 *
 * Null in → null out; no special-casing otherwise (negative / zero
 * arguments produce NaN / -Infinity exactly as Math.log defines — the
 * caller's contract is a positive argument).
 */
case class Ieee754Ln(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ieee_ln expects a double column, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ieee_ln"

  protected override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): Ieee754Ln =
    copy(child = newChild)
}
