package graft.mr

import graft.SparkSpecBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property-based MapReduce laws (SURVEY.md §5.2.3), the contracts implied by
 * the reference's nondeterministic concurrent shuffle: value-order
 * insensitivity, permutation invariance, sorted output, exact multiset
 * grouping. ScalaCheck generators are driven with fixed seeds (the offline
 * cache has no scalatest-plus bridge) so failures are reproducible.
 */
class MapReduceLawsSpec extends SparkSpecBase {
  import spark.implicits._

  private val pairGen: Gen[List[(String, Int)]] =
    Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", "dd", "ee"), Gen.choose(0, 99)))

  private val params = Gen.Parameters.default.withSize(60)
  private def cases(n: Int): Seq[List[(String, Int)]] =
    (1 to n).map(i => pairGen.pureApply(params, Seed(i.toLong)))

  test("law: output keys sorted; grouping partitions the mapped multiset") {
    for (data <- cases(6)) {
      val out = MapReduce.run[String, Int, String, Int, String, Int](
        data.toDS(),
        (k, v) => Iterator.single((k, v)),
        (k, vs) => Iterator.single((k, vs.sum))
      ).collect().toSeq
      val keys = out.map(_._1)
      assert(keys == keys.sorted)
      val expected = data.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      assert(out == expected, s"input: $data")
    }
  }

  test("law: result invariant under input permutation") {
    for ((data, i) <- cases(6).zipWithIndex) {
      val shuffled = new scala.util.Random(i).shuffle(data)
      def go(d: List[(String, Int)]) =
        MapReduce.run[String, Int, String, Int, String, Int](
          d.toDS(),
          (k, v) => Iterator.single((k, v)),
          // order-insensitive reduce over the value multiset
          (k, vs) => Iterator.single((k, vs.toSeq.sorted.hashCode()))
        ).collect().toSeq
      assert(go(data) == go(shuffled), s"input: $data")
    }
  }

  test("law: count-reduce equals groupBy size for random emit multiplicities") {
    for (data <- cases(6)) {
      val out = MapReduce.runAlgebraic[String, Int, String, Int, Long, Long](
        data.toDS(),
        // emit v%3 copies: multiplicity 0..2 per input row
        (k, v) => Seq.fill(v % 3)((k, v)),
        MapReduce.countAgg[Int]
      ).collect().toSeq
      val expected = data.flatMap { case (k, v) => Seq.fill(v % 3)(k) }
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      assert(out == expected, s"input: $data")
    }
  }
}
