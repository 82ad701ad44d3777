package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for the repo's standard DETERMINISTIC double
 * fold: sum a double (optionally squared) over an array IN ARRAY ORDER —
 * the hot scalar of every sorted-fold (`sort_array(collect_list(...))` →
 * sum) in the pagerank/HITS exact contribution folds and the tf-idf
 * norm/dot pipeline.
 *
 * Exists because the composable form — `aggregate(arr, 0.0, (acc, x) =>
 * acc + f(x))` — runs as an interpreted higher-order function: every
 * element pays a lambda dispatch and an `InternalRow` wrapper. This
 * expression is one generated straight-line loop.
 *
 * Semantics are IDENTICAL to the HOF twin (asserted bit-for-bit in
 * `ArrayFieldSumSpec`): sequential IEEE accumulation from +0.0 in array
 * order — the exact addition sequence the HOF performs, so every oracle
 * that replays the fold as `list_reduce` over the same sorted list keeps
 * matching. Null handling mirrors the fold's propagation: a null array is
 * null, and a null element/field turns the accumulator null — once null,
 * the fold stays null — so the result is null iff any element
 * contributes null. An empty array sums to 0.0.
 *
 * `ordinal` selects the struct field to sum (must be DoubleType);
 * ordinal = -1 sums the elements themselves (array<double>). `squared`
 * folds acc + v·v instead of acc + v (the tf-idf norm shape).
 */
case class ArrayFieldSum(child: Expression, ordinal: Int, squared: Boolean)
    extends UnaryExpression {

  private def fieldOk: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => ordinal == -1
    case ArrayType(st: StructType, _) =>
      ordinal >= 0 && ordinal < st.length &&
        st(ordinal).dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (fieldOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_field_sum expects array<double> (ordinal = -1) or " +
        s"array<struct> with a double field at $ordinal, got " +
        child.dataType.catalogString)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_field_sum"

  private def numFields: Int = child.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 0
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    val nf = numFields
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v =
        if (ordinal == -1) arr.getDouble(i)
        else {
          val row = arr.getStruct(i, nf)
          if (row.isNullAt(ordinal)) return null
          row.getDouble(ordinal)
        }
      acc += (if (squared) v * v else v)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val bad = ctx.freshName("bad")
      val row = ctx.freshName("row")
      val term = if (squared) s"$v * $v" else v
      val readV =
        if (ordinal == -1)
          s"""final double $v = $a.getDouble($i);
             |    $acc += $term;""".stripMargin
        else
          s"""final org.apache.spark.sql.catalyst.InternalRow $row =
             |      $a.getStruct($i, $numFields);
             |    if ($row.isNullAt($ordinal)) { $bad = true; break; }
             |    final double $v = $row.getDouble($ordinal);
             |    $acc += $term;""".stripMargin
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  $readV
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ArrayFieldSum = copy(child = newChild)
}
