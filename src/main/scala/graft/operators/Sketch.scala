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

/** One estimated item count from the frequent-items sketch. */
case class ItemCount(item: String, est: Long)

/**
 * Misra-Gries frequent-items ("heavy hitters") sketch as a mergeable typed
 * `Aggregator`: each partition keeps at most `capacity` counters (map-side
 * partial aggregation — ≤ capacity (string, long) pairs cross the shuffle),
 * and merges follow Agarwal et al. (PODS '12, "Mergeable Summaries"): sum
 * counters, then subtract the (capacity+1)-th largest count and drop the
 * non-positive — which preserves the Misra-Gries error bound
 *
 *   true(x) − n/(capacity+1)  ≤  est(x)  ≤  true(x)
 *
 * so every item with frequency above n/(capacity+1) is guaranteed present.
 *
 * Operating points (the IVF-exact pattern):
 *  - capacity ≥ global distinct items → no counter is ever evicted anywhere
 *    → counts are EXACT and independent of row/partition order — the
 *    deterministic point a SQL oracle certifies (`heavy_hitters`);
 *  - capacity < distinct → the classic order-dependent estimate, certified
 *    against the error bound by SketchSpec on adversarially skewed data.
 *
 * Nulls must be filtered by the caller.
 */
class FreqItemsAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[ItemCount]] {

  require(capacity >= 1, s"freqItems: capacity must be >= 1, got $capacity")

  def zero: Map[String, Long] = Map.empty

  def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        // full and unseen: decrement every counter (the new item's implicit
        // counter hits zero immediately), dropping exhausted ones
        buf.collect { case (k, c) if c > 1L => k -> (c - 1L) }
    }

  def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val summed = b2.foldLeft(b1) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count; strictly-greater survive
      val cStar = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      summed.collect { case (k, c) if c > cStar => k -> (c - cStar) }
    }
  }

  /** Deterministic presentation order: count desc, then item asc. */
  def finish(buf: Map[String, Long]): Seq[ItemCount] =
    buf.toSeq.map { case (k, c) => ItemCount(k, c) }
      .sortBy(ic => (-ic.est, ic.item))

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[ItemCount]] = ExpressionEncoder[Seq[ItemCount]]()
}

/** Quantile summary emitted by [[QuantileSketchAggregator]]. */
case class QuantileSummary(n_sample: Int, p50: Double, p90: Double, p99: Double)

/**
 * Bounded-sample quantile sketch: keep the k (hash, value) pairs with the
 * smallest hashes — a uniform-by-hash row sample, the KMV trick applied to
 * sampling instead of distinct-counting — and read discrete quantiles off
 * the sorted sample values. Mergeable (sorted distinct merge capped at k,
 * ≤ k pairs per partition cross the shuffle) and DETERMINISTIC in BOTH
 * branches: the sample is a pure function of the data (smallest k by
 * (hash, value), no RNG, no order dependence), so a SQL oracle replicates
 * the ESTIMATE bit-for-bit (`quantile_sketch`) — unlike reservoir sampling
 * or GK/KLL summaries, whose state depends on arrival order.
 *
 *   k ≥ rows   → sample = everything → quantiles EXACT;
 *   otherwise  → quantiles of a uniform k-sample: rank error is
 *                O(sqrt(log(1/δ)/k)) with probability 1−δ (standard
 *                uniform-sampling bound), certified by SketchSpec.
 *
 * Discrete quantile: sorted sample v_0..v_{m-1}, q = num/den →
 * v[((m-1)·num) / den] with integer floor division — exactly mirrorable in
 * SQL (`//`), no double rounding at half-boundaries.
 *
 * Input: (hash, value); callers hash each row's identity with the portable
 * fingerprint so the oracle can recompute the same sample.
 */
class QuantileSketchAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], QuantileSummary] {

  require(k >= 1, s"quantileSketch: k must be >= 1, got $k")

  private val ord = Ordering.Tuple2[Long, Double]

  def zero: Seq[(Long, Double)] = Vector.empty

  def reduce(buf: Seq[(Long, Double)], p: (Long, Double)): Seq[(Long, Double)] = {
    if (buf.size >= k && ord.gteq(p, buf.last)) buf
    else {
      var lo = 0; var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(buf(mid), p)) lo = mid + 1 else hi = mid
      }
      if (lo < buf.size && buf(lo) == p) buf // exact duplicate pair
      else ((buf.take(lo) :+ p) ++ buf.drop(lo)).take(k)
    }
  }

  def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var i = 0; var j = 0
    while (out.size < k && (i < b1.size || j < b2.size)) {
      val x =
        if (j >= b2.size || (i < b1.size && ord.lteq(b1(i), b2(j)))) { val v = b1(i); i += 1; v }
        else { val v = b2(j); j += 1; v }
      if (out.isEmpty || out.last != x) out += x
    }
    out.toVector
  }

  def finish(buf: Seq[(Long, Double)]): QuantileSummary = {
    val vs = buf.map(_._2).sorted.toIndexedSeq
    val m = vs.length
    if (m == 0) QuantileSummary(0, Double.NaN, Double.NaN, Double.NaN)
    else {
      def at(num: Int, den: Int): Double = vs((((m - 1).toLong * num) / den).toInt)
      QuantileSummary(m, at(1, 2), at(9, 10), at(99, 100))
    }
  }

  def bufferEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder[Seq[(Long, Double)]]()
  def outputEncoder: Encoder[QuantileSummary] = ExpressionEncoder[QuantileSummary]()
}

object Sketch {
  /** Column-level KMV distinct estimate over a pre-hashed column:
    * `kmvDistinct(16)(fingerprint(col("name")))`. */
  def kmvDistinct(k: Int): Column => Column = {
    val fn = udaf(new KmvSketchAggregator(k), ExpressionEncoder[Long]())
    hv => fn(hv)
  }

  /** Column-level frequent-items sketch: `freqItems(64)(col("token"))` →
    * array<struct<item,est>> in count-desc order. */
  def freqItems(capacity: Int): Column => Column = {
    val fn = udaf(new FreqItemsAggregator(capacity), ExpressionEncoder[String]())
    item => fn(item)
  }

  /** Column-level quantile sketch over (rowHash, value):
    * `quantileSketch(256)(fingerprint(rowId), col("price"))` →
    * struct<n_sample,p50,p90,p99>. */
  def quantileSketch(k: Int): (Column, Column) => Column = {
    val fn = udaf(new QuantileSketchAggregator(k), ExpressionEncoder[(Long, Double)]())
    (hv, v) => fn(hv, v)
  }
}
