package graft.operators

import graft.SparkSpecBase

/**
 * The radix-descent exact-percentile operator against a plain sorted-array
 * reference — the correctness surface is the driver-side rank walk
 * (bucket refinement, rank rebasing, clamp edges, terminal value pass),
 * so the spec forces every descent depth: no descent (collectLimit ≥ n),
 * shallow, deep, and past-maxLevels.
 */
class QuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ref(vals: Seq[Double], num: Int, den: Int): Double = {
    val s = vals.sorted
    s(((vals.size - 1).toLong * num / den).toInt) // rank − 1, 0-based
  }

  private def run(rows: Seq[(String, Double)], fanout: Int = 4096,
      collectLimit: Long = 100000L, parts: Int = 7) =
    Quantiles.exactPercentilesByRadix(
        spark.sparkContext.parallelize(rows, parts).toDF("k", "v"),
        "k", "v", fanout = fanout, collectLimit = collectLimit)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("matches the sorted-array reference at every descent depth") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 6000).map(i => (s"g${i % 3}", rnd.nextDouble() * 2000 - 500))
    // (fanout, collectLimit): no descent; shallow; deep (past maxLevels=4
    // at fanout 4 — the terminal sliver path)
    for ((fanout, limit) <- Seq((4096, 100000L), (16, 10L), (4, 25L))) {
      val got = run(rows, fanout, limit)
      for (g <- Seq("g0", "g1", "g2")) {
        val vs = rows.filter(_._1 == g).map(_._2)
        val (n, p50, p90, p99) = got(g)
        assert(n == vs.size)
        assert(p50 == ref(vs, 1, 2) && p90 == ref(vs, 9, 10) &&
          p99 == ref(vs, 99, 100), s"fanout=$fanout limit=$limit group=$g")
      }
    }
  }

  test("ties, constant group, singleton, negatives, max-value clamp edge") {
    // "d" has heavy ties including the max value 4.0 (p99 lands there —
    // the rows that clamp at fanout^l − 1 at every level), "t" is
    // all-equal (resolves with no descent), "s" a singleton
    val rows = Seq.fill(1000)(("t", 5.0)) ++
      (1 to 999).map(i => ("d", (i % 10).toDouble - 5.0)) ++
      Seq(("s", 3.25))
    val got = run(rows, fanout = 16, collectLimit = 8)
    assert(got("t") == ((1000L, 5.0, 5.0, 5.0)))
    val dv = rows.filter(_._1 == "d").map(_._2)
    assert(got("d") == ((999L, ref(dv, 1, 2), ref(dv, 9, 10), ref(dv, 99, 100))))
    assert(got("s") == ((1L, 3.25, 3.25, 3.25)))
  }

  test("partitioning-invariant (counts are partial-aggregated, walk is deterministic)") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 3000).map(i => ("g", rnd.nextGaussian() * 100))
    val a = run(rows, fanout = 16, collectLimit = 20, parts = 1)
    val b = run(rows, fanout = 16, collectLimit = 20, parts = 32)
    assert(a == b)
    val vs = rows.map(_._2)
    assert(a("g")._2 == ref(vs, 1, 2))
  }
}
