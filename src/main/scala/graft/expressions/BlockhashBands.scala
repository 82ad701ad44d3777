package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Blockhash (aHash-family) perceptual-style content signature over an
 * opaque BINARY payload, emitted as `bands` separate band values so no
 * engine ever packs the sign bit (the 62-bit SimHash lesson: DuckDB's
 * BIGINT `<<` cannot reach bit 63; per-band 16-bit values keep every
 * intermediate positive in BOTH engines).
 *
 * The signature: the payload's byte stream is cut into `blocks` equal
 * spans by integer boundaries (block b covers 0-based byte positions
 * `[b·n/blocks, (b+1)·n/blocks)` — exact cover, no remainder), each
 * span's unsigned byte sum is its "intensity", and bit b is set iff
 * `sum_b · blocks > total` (strictly-greater integer compare against the
 * mean — no division, no doubles). Band j packs bits `[j·bandBits,
 * (j+1)·bandBits)` as `Σ bit << (b mod bandBits)`. This is the classic
 * blockhash/average-hash construction over bytes instead of decoded
 * luma; a real media deployment decodes via [[graft.operators.Multimodal
 * .MediaCodec]] first and hashes the pixel plane with the SAME
 * expression — the signature math is payload-agnostic.
 *
 * Engine-portable by construction (byte sums and integer compares), so a
 * SQL oracle recomputes signatures op-for-op — the `dedup_simhash_scale`
 * contract: exactness needs NO corpus-separation assumption.
 *
 * Null payload → null (banding drops the row); empty payload → all-zero
 * bands (empty payloads pair with each other at hamming 0 — exact in
 * both engines).
 */
case class BlockhashBands(child: Expression, blocks: Int, bandBits: Int)
    extends UnaryExpression with CodegenFallback {

  require(blocks > 0 && bandBits > 0 && blocks % bandBits == 0 &&
    bandBits <= 62,
    s"blocks ($blocks) must be a positive multiple of bandBits ($bandBits <= 62)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"blockhash_bands expects a binary column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blockhash_bands"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      BlockhashBands.reference(input.asInstanceOf[Array[Byte]], blocks, bandBits))

  override protected def withNewChildInternal(newChild: Expression): BlockhashBands =
    copy(child = newChild)
}

object BlockhashBands {
  /** Plain-Scala reference twin (the bit-equality spec target — the
    * ShingleHashes convention); the expression routes through it so the
    * pair cannot drift. */
  def reference(payload: Array[Byte], blocks: Int, bandBits: Int): Array[Long] = {
    val n = payload.length.toLong
    val sums = new Array[Long](blocks)
    var total = 0L
    var b = 0
    while (b < blocks) {
      val lo = (b * n / blocks).toInt
      val hi = ((b + 1) * n / blocks).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += payload(i) & 0xff; i += 1 }
      sums(b) = s
      total += s
      b += 1
    }
    val bands = new Array[Long](blocks / bandBits)
    b = 0
    while (b < blocks) {
      if (sums(b) * blocks > total)
        bands(b / bandBits) |= 1L << (b % bandBits)
      b += 1
    }
    bands
  }
}
