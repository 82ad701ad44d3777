package graft.operators

import graft.SparkSpecBase

class StatsSpec extends SparkSpecBase {
  import spark.implicits._

  // rows: (group, x, y)
  private def r(rows: Seq[(String, Long, Long)]) =
    Stats.pearsonByGroup(rows.toDF("g", "x", "y"), group = "g", x = "x", y = "y")
      .as[(String, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("perfect linear relation scores EXACTLY ±1 (perfect-square discriminants)") {
    // x = (0, 3): A = 2·9 − 9 = 9, √9 exact; y = 2x: B = 36, √36 exact
    // → r = 18/(3·6) = 1.0 bit-exact; y = −2x + 6 → −1.0 bit-exact
    val got = r(Seq(("up", 0L, 0L), ("up", 3L, 6L),
      ("dn", 0L, 6L), ("dn", 3L, 0L)))
    assert(got("up") == ((2L, Some(1.0))))
    assert(got("dn") == ((2L, Some(-1.0))))
  }

  test("a constant variable yields NULL, never NaN or a divide-by-zero") {
    val got = r(Seq(("cx", 5L, 1L), ("cx", 5L, 9L),   // x constant
      ("cy", 1L, 7L), ("cy", 9L, 7L),                 // y constant
      ("one", 4L, 4L)))                               // single row
    assert(got("cx") == ((2L, None)) && got("cy") == ((2L, None)))
    assert(got("one") == ((1L, None)))
  }

  test("independent variables score near 0; lifted form tracks the naive formula") {
    val rnd = new scala.util.Random(5)
    val rows = for (g <- Seq("a", "b"); _ <- 1 to 200)
      yield (g, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)
    val got = r(rows)
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val n = xs.size.toDouble
      val mx = xs.map(_._2).sum / n; val my = xs.map(_._3).sum / n
      val cov = xs.map(t => (t._2 - mx) * (t._3 - my)).sum / n
      val sx = math.sqrt(xs.map(t => (t._2 - mx) * (t._2 - mx)).sum / n)
      val sy = math.sqrt(xs.map(t => (t._3 - my) * (t._3 - my)).sum / n)
      val naive = cov / (sx * sy)
      assert(math.abs(got(g)._2.get - naive) < 1e-9, g)
      assert(math.abs(got(g)._2.get) < 0.2, s"$g should be near-independent")
    }
  }

  test("groups are independent (one group's relation doesn't leak)") {
    val got = r(Seq(("lin", 0L, 0L), ("lin", 3L, 6L),
      ("anti", 0L, 6L), ("anti", 3L, 0L),
      ("flat", 2L, 5L), ("flat", 2L, 8L)))
    assert(got("lin")._2 == Some(1.0) && got("anti")._2 == Some(-1.0) &&
      got("flat")._2.isEmpty)
  }

  private def robust(rows: Seq[(String, Long)], k: Int = 3) =
    Stats.robustStatsByGroup(rows.toDF("g", "v"), group = "g", value = "v",
        k = k)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

  test("robustStatsByGroup matches a sort-based reference (lower median, MAD, k·MAD rule)") {
    val rnd = new scala.util.Random(11)
    val rows = (for (g <- Seq("a", "b"); _ <- 1 to 301)
      yield (g, rnd.nextInt(50).toLong)) ++
      Seq.fill(10)(("a", 500L)) // planted far outliers in one group
    val got = robust(rows)
    Caches.releaseAll()
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val vs = xs.map(_._2).sorted
      val med = vs((vs.size - 1) / 2)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs((devs.size - 1) / 2)
      val out = vs.count(v => math.abs(v - med) > 3 * mad)
      assert(got(g) == ((vs.size.toLong, med, mad, out.toLong)), g)
    }
    // the planted spikes are outliers in 'a' and don't leak into 'b'
    assert(got("a")._4 >= 10L && got("b")._4 == 0L)
  }

  test("MAD is immune to the tail that moves a stddev (constant group: MAD 0)") {
    val got = robust(Seq(("c", 7L), ("c", 7L), ("c", 7L), ("c", 7L),
      ("c", 9000L))) // one wild value
    Caches.releaseAll()
    assert(got("c") == ((5L, 7L, 0L, 1L))) // median/MAD untouched; 1 outlier
  }
}
