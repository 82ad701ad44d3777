package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate: ordering is (cos desc, neighbor_id asc). */
final case class Scored(neighbor_id: Long, cos: Double)

/**
 * Exact bounded top-k as a typed `Aggregator` — Catalyst plans it with
 * map-side partial aggregation, so each partition reduces its candidates to
 * at most k rows BEFORE the shuffle. The window alternative
 * (`row_number over (partition by query order by score)`) shuffles every
 * scored candidate and sorts per query; at a 1000-executor scale that is
 * the difference between moving k rows per partition and moving the whole
 * scored stream (SURVEY.md §7.5's planned top-k heap).
 *
 * The buffer is a best-first-sorted vector of ≤ k entries; reduce is a
 * bounded insertion, merge is a bounded sorted-merge — both O(k).
 */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.neighbor_id < b.neighbor_id)

  def zero: Seq[Scored] = Vector.empty

  def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val idx = buf.indexWhere(b => better(x, b)) match {
        case -1 => buf.size
        case i => i
      }
      ((buf.take(idx) :+ x) ++ buf.drop(idx)).take(k)
    }

  def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = {
    val out = Vector.newBuilder[Scored]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < b1.size || j < b2.size)) {
      val takeLeft = j >= b2.size || (i < b1.size && better(b1(i), b2(j)))
      if (takeLeft) { out += b1(i); i += 1 } else { out += b2(j); j += 1 }
      n += 1
    }
    out.result()
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
