package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MarkovSpec extends SparkSpecBase {
  import spark.implicits._

  private def trans(rows: Seq[(String, Long, Long, String)]) =
    Markov.transitions(rows.toDF("u", "t", "id", "ty"),
      key = "u", time = "t", typ = "ty", tieBreak = "id")

  test("hand-computed transitions: counts per consecutive pair, per user") {
    // u1: a b a b  → (a,b)x2 (b,a)x1 ; u2: a a c → (a,a) (a,c)
    val got = trans(Seq(
        ("u1", 1L, 1L, "a"), ("u1", 2L, 2L, "b"), ("u1", 3L, 3L, "a"),
        ("u1", 4L, 4L, "b"),
        ("u2", 1L, 5L, "a"), ("u2", 2L, 6L, "a"), ("u2", 3L, 7L, "c")))
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(
      ("a", "a", 1L), ("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L)))
    // probs are exact integer ratios: from a → 4 transitions, from b → 1
    assert(got.map(_._4) == Seq(1.0 / 4, 2.0 / 4, 1.0 / 4, 1.0))
  }

  test("sequences never cross users; a single-event user yields no pair") {
    val got = trans(Seq(
        ("u1", 1L, 1L, "a"),           // lone event — no transition
        ("u2", 5L, 2L, "b"), ("u2", 6L, 3L, "c")))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("b", "c", 1L, 1.0)))
  }

  test("simultaneous events order by the tie-break column (deterministic pair multiset)") {
    // same timestamp: id decides b before c, so a→b→c, never a→c
    val got = trans(Seq(
        ("u", 1L, 1L, "a"), ("u", 2L, 2L, "b"), ("u", 2L, 3L, "c")))
      .orderBy("from_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq(("a", "b"), ("b", "c")))
  }

  test("row probabilities sum to 1 per from-type") {
    val sums = trans(Seq(
        ("u1", 1L, 1L, "x"), ("u1", 2L, 2L, "y"), ("u1", 3L, 3L, "z"),
        ("u2", 1L, 4L, "x"), ("u2", 2L, 5L, "z"), ("u2", 3L, 6L, "x")))
      .groupBy("from_type").agg(sum("prob").as("p"))
      .select("p").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(p => math.abs(p - 1.0) < 1e-12))
  }
}
