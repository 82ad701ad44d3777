package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass native token statistics:
 * `struct(n_tokens, n_subwords, sum_tok_len, n_stopwords, n_punct, n_chars)`
 * — the integer ingredients every text-quality column is a ratio of. The
 * composable forms re-tokenized per metric through interpreted
 * `aggregate`/`filter` lambdas; here the document is split once and all
 * counters fold in one loop. The double RATIOS stay in the Column layer
 * (TextFunctions) with the exact same cast/divide order as before, so
 * oracle arithmetic is bit-identical.
 *
 * Semantics mirror the composable twins exactly (TextFunctionsSpec pins
 * both against plain-Scala references):
 *  - tokens: trim spaces (' ' only, as Spark trim), split Java `\s+`
 *    (limit -1), blank → zero tokens;
 *  - n_subwords: Σ max(1, ceil(len(t)/6.0)) — IEEE double divide + ceil,
 *    matching `ceil(length(t) / 6.0)`;
 *  - token/char lengths count CODEPOINTS (Spark `length`);
 *  - n_stopwords: exact membership in the plan-time stopword list;
 *  - n_punct: Java-regex `\p{Punct}` class = ASCII POSIX punct, counted
 *    over the WHOLE (untrimmed) text, as `regexp_replace(text,
 *    "[^\p{Punct}]", "")` does; n_chars likewise whole-text codepoints.
 */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_stats expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  override def prettyName: String = "token_stats"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val stopSet: Set[String] = stopwords.toSet

  private def isPosixPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)

  private def codePointLen(s: String): Int = s.codePointCount(0, s.length)

  override def nullSafeEval(input: Any): Any = {
    val full = input.asInstanceOf[UTF8String].toString
    // whole-text counters (punct ratio denominators use UNtrimmed text)
    var nChars = 0
    var nPunct = 0
    var i = 0
    while (i < full.length) {
      val cp = full.codePointAt(i)
      nChars += 1
      if (isPosixPunct(cp)) nPunct += 1
      i += Character.charCount(cp)
    }
    val trimmed = input.asInstanceOf[UTF8String].trim().toString
    var nTokens = 0
    var nSubwords = 0L
    var sumTokLen = 0L
    var nStop = 0
    if (trimmed.nonEmpty) {
      for (t <- ws.split(trimmed, -1)) {
        nTokens += 1
        val len = codePointLen(t)
        sumTokLen += len
        nSubwords += math.max(1L, math.ceil(len / 6.0).toLong)
        if (stopSet.contains(t)) nStop += 1
      }
    }
    new GenericInternalRow(Array[Any](
      nTokens, nSubwords, sumTokLen, nStop, nPunct, nChars))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}
