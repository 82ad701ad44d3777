package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native rolling-hash document fingerprint — the engine-portable polynomial
 * contract of `TextFunctions.fingerprint`, in one per-row loop:
 *
 *   tokenHash(t) = fold over codepoints, h = (h·31 + cp) mod M from 17
 *   fingerprint  = fold over tokens, h = (h·1000003 + tokenHash) mod M from 0
 *   M = 2^31 - 1
 *
 * Bit-identical to the composable HOF form (asserted in TextFunctionsSpec
 * against the plain-Scala reference AND the HOF twin) and to the DuckDB
 * oracle's lambda replication. Exists because the HOF form folds per
 * CHARACTER through interpreted `aggregate(transform(sequence...))` —
 * a substr + ascii + pmod expression per codepoint (~half the
 * fingerprint-dedup queries' time at sf0.1).
 *
 * Tokenization mirrors TextFunctions.tokens: trim spaces (only ' ', as
 * Spark's trim does), split on Java-regex `\s+` (limit -1), empty/blank →
 * zero tokens → fingerprint 0.
 */
case class DocFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  private val M = 2147483647L

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  override def nullSafeEval(input: Any): Any = {
    val trimmed = input.asInstanceOf[UTF8String].trim().toString
    if (trimmed.isEmpty) return 0L
    var doc = 0L
    for (t <- ws.split(trimmed, -1)) {
      var h = 17L
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        h = (h * 31L + cp) % M
        i += Character.charCount(cp)
      }
      doc = (doc * 1000003L + h) % M
    }
    doc
  }

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}
