package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.ShiftRight
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Distributed Bloom-filter build as a mergeable typed `Aggregator`: each
 * partition ORs key bits into a fixed `Array[Long]` bitmap (map-side partial
 * aggregation — exactly numBits/8 bytes cross the shuffle per partition,
 * regardless of key count), merges are word-wise ORs, and the finished
 * bitmap is a plain long array a `Column` predicate can probe.
 *
 * Bit positions use double hashing off one portable 31-bit hash:
 * p_i = (hv + i·(1 + hv mod 8191)) mod numBits — mirrored EXACTLY between
 * the Scala build path here and the codegen'd Column probe in
 * [[Bloom.mightContain]], so membership has no false negatives by
 * construction (asserted in BloomSpec).
 */
class BloomBitmapAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"bloom: numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1, s"bloom: numHashes must be >= 1, got $numHashes")

  private val numWords = numBits / 64

  def zero: Array[Long] = new Array[Long](numWords)

  def reduce(buf: Array[Long], hv: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val p = Bloom.position(hv, i, numBits)
      buf((p >>> 6).toInt) |= (1L << (p & 63L))
      i += 1
    }
    buf
  }

  def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var w = 0
    while (w < numWords) { b1(w) |= b2(w); w += 1 }
    b1
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/**
 * Bloom-prefiltered semi join — the 100 TB shape for "keep fact rows whose
 * key exists in a dim set": build a compact bitmap of the dim keys (one
 * distributed aggregation over the SMALL side), probe it with a
 * codegen-friendly native predicate on the FACT side *before* any
 * join shuffle (false-positive survivors only — typically a few % — reach
 * the join), then close with an exact semi join so the final answer is
 * EXACTLY the plain semi join (Bloom filters have no false negatives; the
 * oracle for `bloom_semi_join` is the unfiltered `IN` subquery).
 *
 * On a cluster this is the classic runtime-filter pattern: the fact-side
 * scan discards non-matching rows at the source, so the shuffle (or even
 * the broadcast probe) sees orders of magnitude fewer rows. Spark's AQE
 * can inject such filters for equi-joins it plans itself; this operator
 * makes the pattern available as an explicit, tunable building block
 * (e.g. in front of custom candidate-generation pipelines).
 */
object Bloom {

  /** Mersenne prime 2^31-1 — the engine's portable hash space. */
  private val M = 2147483647L

  /** Bit position i for hash hv: double hashing, stride derived from hv. */
  private[operators] def position(hv: Long, i: Int, numBits: Int): Long =
    (hv + i.toLong * (1L + hv % 8191L)) % numBits.toLong

  /** Build the dim-side bitmap: one job over `dim`, result is numBits/8
    * bytes on the driver (bounded — the IVF-centroid kind of collect). */
  def keyBitmap(dim: DataFrame, key: String, numBits: Int, numHashes: Int): Array[Long] = {
    val fn = udaf(new BloomBitmapAggregator(numBits, numHashes), ExpressionEncoder[Long]())
    dim.filter(col(key).isNotNull)
      .select(fn(pmod(col(key), lit(M))).as("bitmap"))
      .head().getAs[scala.collection.Seq[Long]]("bitmap").toArray
  }

  /**
   * Probe predicate — the Column twin of the build path's bit math. The
   * bitmap rides along as an array literal; probes are element_at + a
   * variable-distance ShiftRight (native Catalyst, codegen'd — no UDF, no
   * interpreted HOF), unrolled per hash at plan time.
   */
  def mightContain(bits: Array[Long], numBits: Int, numHashes: Int, hv: Column): Column = {
    val bmp = lit(bits)
    (0 until numHashes).map { i =>
      val p = (hv + lit(i.toLong) * (hv % lit(8191L) + lit(1L))) % lit(numBits.toLong)
      val word = element_at(bmp, shiftright(p, 6).cast("int") + lit(1))
      val bit = ColumnBridge.column(ShiftRight(
        ColumnBridge.expression(word),
        ColumnBridge.expression((p % lit(64L)).cast("int"))))
      bit.bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /**
   * fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey), with the fact
   * side pre-filtered through a Bloom bitmap of the dim keys. Builds the
   * bitmap EAGERLY (one bounded job over the small side at plan-construction
   * time, like the IVF quantizer fit). Keys must be integral.
   */
  def semiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      numBits: Int = 1 << 16,
      numHashes: Int = 4): DataFrame = {
    val bits = keyBitmap(dim, dimKey, numBits, numHashes)
    val pre = fact.filter(
      col(factKey).isNotNull &&
        mightContain(bits, numBits, numHashes, pmod(col(factKey), lit(M))))
    val dimKeys = dim.select(col(dimKey))
    pre.join(dimKeys, pre(factKey) === dimKeys(dimKey), "left_semi")
  }
}
