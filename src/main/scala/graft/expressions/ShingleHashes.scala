package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word-k-shingle hasher: `shingle_hashes(text, k)` returns
 * `array<long>` — the xxhash64 (seed 42, Spark's `xxhash64` function) of
 * each word k-shingle of `text`.
 *
 * Semantics are IDENTICAL to the composable form
 * `transform(TextFunctions.shingles(text, k), s => xxhash64(s))` (asserted
 * bit-for-bit in `ShingleHashesSpec`, including the whitespace edge cases):
 *  - leading/trailing SPACES are trimmed (Spark `trim` trims ' ' only);
 *  - tokens split on Java-regex `\s+` with limit -1 (so a leading or
 *    trailing non-space whitespace run yields an empty token, exactly as
 *    Spark's `split` does);
 *  - `<= k` tokens (including zero) hash the single space-joined whole
 *    string;
 *  - otherwise one hash per k-token window joined by single spaces.
 *
 * Exists because shingling is the single hottest pass of corpus dedup and
 * the higher-order form runs interpreted: per shingle it pays a `sequence`
 * array build, a `slice` array copy, a `concat_ws` and a lambda dispatch
 * (~10µs/shingle measured at sf0.1 — ~2/3 of the whole near-dup pipeline).
 * Here the whole document shingles in one native loop over the decoded
 * token array with zero intermediate Catalyst arrays. The shingle STRINGS
 * are never produced as output — only their 64-bit hashes — so the dedup
 * join keys stay compact longs end-to-end.
 *
 * `CodegenFallback` is deliberate: the expression is evaluated once per
 * document row (its internal loop is the work), so the per-row virtual
 * call costs nothing measurable and the surrounding projection stays in
 * whole-stage codegen.
 */
case class ShingleHashes(child: Expression, k: Int, portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle_hashes: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** Mersenne prime 2^31-1 — matches TextFunctions.tokenHashWith. */
  private val M = 2147483647L

  /** Codepoint polynomial fold, h = (h·mult + cp) mod M from 17 — the
    * engine-portable hash family (ascii()/length()/substr() in any SQL
    * engine iterate codepoints, as this does; exact in Long: h·37+cp <
    * 2^37). */
  private def polyHash(s: String, mult: Long): Long = {
    var h = 17L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % M
      i += Character.charCount(cp)
    }
    h
  }

  /**
   * `portable=false`: xxhash64 (Spark's, seed 42) — the throughput default.
   * `portable=true`: a 62-bit ENGINE-PORTABLE hash, `poly31 | poly37 << 31`
   * — two independent codepoint polynomial folds mod 2^31-1, replicable
   * op-for-op in any SQL engine's lambda functions. Exists so signature
   * pipelines built on shingle hashes (e.g. the scale-point SimHash query)
   * can have an oracle that computes the SAME signatures exactly, instead
   * of leaning on corpus-separation arguments.
   */
  private def hashOf(s: String): Long =
    if (portable) polyHash(s, 31L) | (polyHash(s, 37L) << 31)
    else XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  override def nullSafeEval(input: Any): Any = {
    val trimmed = input.asInstanceOf[UTF8String].trim().toString
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty else ws.split(trimmed, -1)
    val n = toks.length
    if (n <= k) {
      new GenericArrayData(Array(hashOf(toks.mkString(" "))))
    } else {
      val out = new Array[Long](n - k + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n - k + 1) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = hashOf(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
