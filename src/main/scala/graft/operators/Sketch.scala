package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * KMV (k-minimum-values) distinct-count sketch as a typed `Aggregator` —
 * the mergeable-sketch shape a 100 TB distinct-count needs: each partition
 * keeps only the k smallest DISTINCT hash values (map-side partial
 * aggregation, ≤ k longs per partition cross the shuffle), merges are
 * bounded sorted-merges, and the estimator reads the k-th minimum:
 *
 *   distinct < k  → buffer holds every distinct hash → EXACT count;
 *   otherwise     → est = (k-1) · M / h_k  (the classic KMV estimator over
 *                   hashes uniform on [0, M)).
 *
 * DETERMINISTIC by construction — the sketch hashes with the engine's
 * portable polynomial fingerprint, so the whole estimate (not just the
 * exact branch) is a pure function of the data that a SQL oracle
 * replicates bit-for-bit: same hashes → same k-th minimum → same IEEE
 * double arithmetic (see the `distinct_sketch` query). Hash collisions
 * (n²/2M odds) bias the ESTIMATE like any KMV sketch, but both engines
 * see the same collision, so correctness checking is unaffected.
 *
 * Input: the hash value (caller hashes, e.g. `TextFunctions.fingerprint`);
 * nulls must be filtered by the caller (primitive-Long input encoder).
 */
class KmvSketchAggregator(k: Int) extends Aggregator[Long, Seq[Long], Double] {

  require(k >= 2, s"kmv: k must be >= 2, got $k")

  def zero: Seq[Long] = Vector.empty

  def reduce(buf: Seq[Long], hv: Long): Seq[Long] = {
    if (buf.size >= k && hv >= buf.last) buf
    else {
      val idx = java.util.Arrays.binarySearch(buf.toArray, hv)
      if (idx >= 0) buf // already present (distinct-ness)
      else {
        val ins = -idx - 1
        ((buf.take(ins) :+ hv) ++ buf.drop(ins)).take(k)
      }
    }
  }

  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = {
    // sorted distinct merge, capped at k
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0; var j = 0
    while (out.size < k && (i < b1.size || j < b2.size)) {
      val x =
        if (j >= b2.size || (i < b1.size && b1(i) <= b2(j))) { val v = b1(i); i += 1; v }
        else { val v = b2(j); j += 1; v }
      if (out.isEmpty || out.last != x) out += x
    }
    out.toVector
  }

  /** M = 2^31 - 1: the portable-fingerprint hash space. */
  private val M = 2147483647.0

  def finish(buf: Seq[Long]): Double =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * M) / buf.last.toDouble

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
}

object Sketch {
  /** Column-level KMV distinct estimate over a pre-hashed column:
    * `kmvDistinct(16)(fingerprint(col("name")))`. */
  def kmvDistinct(k: Int): Column => Column = {
    val fn = udaf(new KmvSketchAggregator(k), ExpressionEncoder[Long]())
    hv => fn(hv)
  }
}
