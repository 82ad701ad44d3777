package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Binned range join vs a plain-Scala nested-loop reference: inclusive
  * bounds, key isolation, overlap multiplicity, bin-width invariance. */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val points = Seq(
    (1L, 0L, 5L), (2L, 0L, 10L), (3L, 0L, 15L), (4L, 0L, 100L),
    (5L, 1L, 10L))
    .toDF("pid", "k", "x")
  private val intervals = Seq(
    (10L, 0L, 0L, 10L),    // [0,10] key 0
    (11L, 0L, 10L, 20L),   // [10,20] — overlaps at x=10 (multiplicity 2)
    (12L, 1L, 5L, 15L))    // key 1
    .toDF("iid", "k", "lo", "hi")

  test("inclusive bounds, key isolation, overlap multiplicity") {
    for (bw <- Seq(1L, 3L, 10L, 1000L)) { // result must not depend on bin width
      val got = RangeJoin.binnedIntervalJoin(points, intervals,
          Seq("k"), "x", "lo", "hi", bw)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (5L, 12L)),
        s"binWidth=$bw")
    }
  }

  test("randomized agreement with a nested-loop reference") {
    val rnd = new scala.util.Random(13)
    val ps = (1 to 200).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(500).toLong))
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(500).toLong
      (1000L + i, rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(80).toLong)
    }
    val want = (for {
      (pid, pk, x) <- ps
      (iid, ik, lo, hi) <- ivs
      if pk == ik && x >= lo && x <= hi
    } yield (pid, iid)).toSet
    val got = RangeJoin.binnedIntervalJoin(
        ps.toDF("pid", "k", "x"), ivs.toDF("iid", "k", "lo", "hi"),
        Seq("k"), "x", "lo", "hi", binWidth = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
