package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate: ordering is (cos desc, neighbor_id asc). */
final case class Scored(neighbor_id: Long, cos: Double)

/**
 * Exact bounded DISTINCT-NEIGHBOR top-k as a typed `Aggregator` — Catalyst
 * plans it with map-side partial aggregation, so each partition reduces its
 * candidates to at most k rows BEFORE the shuffle. The window alternative
 * (`row_number over (partition by query order by score)`) shuffles every
 * scored candidate and sorts per query; at a 1000-executor scale that is
 * the difference between moving k rows per partition and moving the whole
 * scored stream (SURVEY.md §7.5's planned top-k heap).
 *
 * Duplicate MEETINGS of the same neighbor (multi-band LSH delivers each
 * true neighbor through several buckets) collapse inside the aggregator —
 * an id appears at most once per buffer, keeping its best score. That
 * removes the pair-dedup (`dropDuplicates`) shuffle from every bucketed
 * ANN path: candidates flow from the bucket join straight into partial
 * aggregation, and the only thing shuffled is ≤ k rows per partition per
 * query (a dedup shuffle would carry both embeddings per candidate row —
 * measured ~400 MB at a 500k-vector corpus).
 *
 * The buffer is a best-first-sorted vector of ≤ k id-distinct entries;
 * reduce is a bounded insertion, merge a bounded sorted-merge — both O(k)
 * (the id-containment scans are over ≤ k elements).
 */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.neighbor_id < b.neighbor_id)

  def zero: Seq[Scored] = Vector.empty

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
    val idx = buf.indexWhere(b => better(x, b)) match {
      case -1 => buf.size
      case i => i
    }
    ((buf.take(idx) :+ x) ++ buf.drop(idx)).take(k)
  }

  def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = {
    val ex = buf.indexWhere(_.neighbor_id == x.neighbor_id)
    if (ex >= 0) {
      // seen this neighbor: keep the better scoring of the two
      if (better(x, buf(ex))) insert(buf.take(ex) ++ buf.drop(ex + 1), x) else buf
    } else if (buf.size >= k && better(buf.last, x)) buf
    else insert(buf, x)
  }

  def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Scored]
    var i = 0; var j = 0
    while (out.size < k && (i < b1.size || j < b2.size)) {
      val takeLeft = j >= b2.size || (i < b1.size && better(b1(i), b2(j)))
      val x = if (takeLeft) { val v = b1(i); i += 1; v }
              else { val v = b2(j); j += 1; v }
      // inputs are id-distinct and best-first: the first sighting of an id
      // is its best score, later sightings drop
      if (!out.exists(_.neighbor_id == x.neighbor_id)) out += x
    }
    out.toVector
  }

  def finish(r: Seq[Scored]): Seq[Scored] = r
  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** Column-level bounded top-k: `topK(5)(col("neighbor_id"), col("cos"))`
    * aggregates to an array of (neighbor_id, cos) structs, best first. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), ExpressionEncoder[Scored]())
    (id, score) => fn(id, score)
  }
}
