package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass language-ID — the marker-scoring contract of
 * `TextFunctions.langIdHof` in a single per-row loop: lower-case the text
 * once (UTF8String.toLowerCase, the same kernel Spark's `lower` uses), pad
 * with one space each side, count marker hits per language (byte-level
 * UTF8String.contains — exact for UTF-8, which is self-synchronizing),
 * argmax with ties toward the lexicographically-later language code, "und"
 * when nothing scores. NULL text scores zero everywhere → "und" (the HOF
 * twin's `when(null-condition).otherwise(0)` collapse), so the result is
 * never null.
 *
 * Exists because the composable form re-evaluates `lower(text)` inside each
 * of the 25 `contains` terms and resolves the argmax through `greatest`
 * over struct values — interpreted struct comparisons per row that measured
 * ~0.5 ms/doc at sf0.1 (2.7 s for a query that is otherwise a count).
 * Bit-equality with the HOF twin is asserted in TextFunctionsSpec.
 */
case class LangId(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  require(markers.nonEmpty, "lang_id: markers must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  // never null: null/empty/markerless input all resolve to "und"
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id"

  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val space = UTF8String.fromString(" ")
  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val langCodes: Array[String] = markers.map(_._1).toArray
  @transient private lazy val marks: Array[Array[UTF8String]] =
    markers.map(_._2.map(UTF8String.fromString).toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return und
    val padded = UTF8String.concat(space,
      v.asInstanceOf[UTF8String].toLowerCase, space)
    var best = -1
    var bestScore = -1
    var l = 0
    while (l < marks.length) {
      var s = 0
      var m = 0
      val ms = marks(l)
      while (m < ms.length) {
        if (padded.contains(ms(m))) s += 1
        m += 1
      }
      // ties toward the lexicographically-later language code — the
      // (score, lang) struct-max ordering of the composable twin
      if (s > bestScore ||
          (s == bestScore && langCodes(l) > langCodes(best))) {
        bestScore = s
        best = l
      }
      l += 1
    }
    if (bestScore == 0) und else langs(best)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
