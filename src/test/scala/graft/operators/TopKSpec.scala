package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for the bounded top-k aggregator's reduce/merge laws. */
class TopKSpec extends AnyFunSuite {

  private def agg(k: Int) = new TopKAggregator(k)
  private def s(id: Long, c: Double) = Scored(id, c)

  test("reduce keeps best k sorted (score desc, id asc)") {
    val a = agg(3)
    val buf = Seq(s(1, 0.9), s(2, 0.8), s(3, 0.7), s(4, 0.95), s(5, 0.1))
      .foldLeft(a.zero)(a.reduce)
    assert(buf == Seq(s(4, 0.95), s(1, 0.9), s(2, 0.8)))
  }

  test("ties break by id ascending") {
    val a = agg(2)
    val buf = Seq(s(9, 0.5), s(3, 0.5), s(7, 0.5)).foldLeft(a.zero)(a.reduce)
    assert(buf == Seq(s(3, 0.5), s(7, 0.5)))
  }

  test("merge of partial buffers equals reduce over the union") {
    val a = agg(4)
    val xs = Seq(s(1, 0.3), s(2, 0.9), s(3, 0.5), s(4, 0.7))
    val ys = Seq(s(5, 0.8), s(6, 0.2), s(7, 0.95))
    val merged = a.merge(xs.foldLeft(a.zero)(a.reduce), ys.foldLeft(a.zero)(a.reduce))
    val direct = (xs ++ ys).foldLeft(a.zero)(a.reduce)
    assert(merged == direct)
    assert(merged == Seq(s(7, 0.95), s(2, 0.9), s(5, 0.8), s(4, 0.7)))
  }

  test("merge is commutative and handles empty/short buffers") {
    val a = agg(3)
    val xs = Seq(s(1, 0.6)).foldLeft(a.zero)(a.reduce)
    assert(a.merge(xs, a.zero) == xs)
    assert(a.merge(a.zero, xs) == xs)
    val ys = Seq(s(2, 0.4), s(3, 0.8)).foldLeft(a.zero)(a.reduce)
    assert(a.merge(xs, ys) == a.merge(ys, xs))
  }

  test("duplicate neighbor meetings collapse to one entry (best score kept)") {
    val a = agg(3)
    val buf = Seq(s(1, 0.9), s(1, 0.9), s(2, 0.8), s(1, 0.95), s(2, 0.7))
      .foldLeft(a.zero)(a.reduce)
    assert(buf == Seq(s(1, 0.95), s(2, 0.8)))
  }

  test("merge collapses ids seen in both partials, keeping the better score") {
    val a = agg(3)
    val xs = Seq(s(1, 0.9), s(2, 0.5)).foldLeft(a.zero)(a.reduce)
    val ys = Seq(s(1, 0.7), s(3, 0.8)).foldLeft(a.zero)(a.reduce)
    val m = a.merge(xs, ys)
    assert(m == Seq(s(1, 0.9), s(3, 0.8), s(2, 0.5)))
    assert(m == a.merge(ys, xs))
  }

  test("k=1 keeps only the single best") {
    val a = agg(1)
    val buf = Seq(s(1, 0.1), s(2, 0.9), s(3, 0.5)).foldLeft(a.zero)(a.reduce)
    assert(buf == Seq(s(2, 0.9)))
  }
}
