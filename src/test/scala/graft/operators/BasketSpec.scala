package graft.operators

import graft.SparkSpecBase

class BasketSpec extends SparkSpecBase {
  import spark.implicits._

  private def counts(rows: Seq[(Long, Long)]) =
    Basket.pairCounts(rows.toDF("bk", "it"), basket = "bk", item = "it")
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("hand-computed supports over three baskets") {
    // b1 {1,2,3}, b2 {1,2}, b3 {2,3} → (1,2)x2 (1,3)x1 (2,3)x2
    val got = counts(Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L)))
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("an item repeated within one basket counts once (distinct-first)") {
    val got = counts(Seq((1L, 7L), (1L, 7L), (1L, 7L), (1L, 9L)))
    assert(got == Seq((7L, 9L, 1L)))
  }

  test("pairs are canonical (a < b) and never self-paired or cross-basket") {
    val got = counts(Seq((1L, 5L), (1L, 3L), (2L, 5L), (2L, 8L), (3L, 1L)))
    assert(got.forall(p => p._1 < p._2))
    assert(got == Seq((3L, 5L, 1L), (5L, 8L, 1L)))
  }

  test("singleton baskets produce nothing") {
    assert(counts(Seq((1L, 1L), (2L, 2L), (3L, 3L))).isEmpty)
  }

  test("per-basket pair count is exactly C(k,2)") {
    val got = counts((1L to 7L).map(i => (1L, i)))
    assert(got.length == 21 && got.forall(_._3 == 1L))
  }

  private def jac(rows: Seq[(Long, Long)]) = {
    val got = Basket.itemJaccard(rows.toDF("bk", "it"), basket = "bk", item = "it")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    Caches.releaseAll()
    got
  }

  test("itemJaccard: hand-computed intersection-over-union") {
    // item 1 in {b1,b2}, item 2 in {b1,b2,b3}, item 3 in {b3}
    // (1,2): ∩=2, ∪=3 → 2/3;  (2,3): ∩=1, ∪=3 → 1/3;  (1,3): ∩=0 → absent
    val got = jac(Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 2L), (3L, 3L)))
    assert(got == Seq((1L, 2L, 2L, 2.0 / 3.0), (2L, 3L, 1L, 1.0 / 3.0)))
  }

  test("itemJaccard: identical basket sets score exactly 1.0") {
    val got = jac(Seq((1L, 4L), (1L, 5L), (2L, 4L), (2L, 5L)))
    assert(got == Seq((4L, 5L, 2L, 1.0)))
  }

  test("itemJaccard: the division is the exact-integer quotient (bit law)") {
    // every emitted jaccard must equal cnt.toDouble / (n_a+n_b-cnt).toDouble
    // recomputed from the same integers — the oracle's replay contract
    val rows = for (b <- 1L to 6L; i <- 1L to (b % 4 + 1)) yield (b, i)
    val items = rows.distinct
    val n = items.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
    val got = jac(rows)
    assert(got.nonEmpty)
    got.foreach { case (a, b, cnt, j) =>
      assert(j == cnt.toDouble / (n(a) + n(b) - cnt).toDouble)
    }
  }

  private def triples(rows: Seq[(Long, Long)], minSupport: Long) = {
    val got = Basket.frequentTriples(rows.toDF("bk", "it"),
        basket = "bk", item = "it", minSupport = minSupport)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    Caches.releaseAll()
    got
  }

  /** Unpruned brute-force reference: count every a<b<c triple per basket
    * directly — the A-priori prunes must not change this answer. */
  private def triplesReference(rows: Seq[(Long, Long)],
      minSupport: Long): Seq[(Long, Long, Long, Long)] = {
    val baskets = rows.distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    baskets.toSeq
      .flatMap(is => for {
        i <- is.indices; j <- (i + 1) until is.size; k <- (j + 1) until is.size
      } yield (is(i), is(j), is(k)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .collect { case ((a, b, c), s) if s >= minSupport => (a, b, c, s) }
      .sorted
  }

  test("frequentTriples: hand-computed supports with the prune active") {
    // b1 {1,2,3,4}, b2 {1,2,3}, b3 {1,2,4}: (1,2,3)x2 (1,2,4)x2, others x1
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (3L, 4L))
    assert(triples(rows, 2L) == Seq((1L, 2L, 3L, 2L), (1L, 2L, 4L, 2L)))
  }

  test("frequentTriples ≡ unpruned brute force on random baskets (A-priori law)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(12).toLong))
    for (s <- Seq(1L, 2L, 3L))
      assert(triples(rows, s) == triplesReference(rows, s), s"minSupport=$s")
  }

  test("frequentTriples: below-support triples and sub-triple baskets emit nothing") {
    // two disjoint baskets of 3: each triple has support 1
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (2L, 6L))
    assert(triples(rows, 2L).isEmpty)
    assert(triples(Seq((1L, 1L), (1L, 2L)), 1L).isEmpty) // no 3rd item
  }
}
