package graft.operators

import graft.SparkSpecBase

class TimeseriesSpec extends SparkSpecBase {
  import spark.implicits._

  // rows: (key, time, value)
  private def z(rows: Seq[(String, Long, Long)]) =
    Timeseries.zscoreAnomalies(rows.toDF("k", "t", "x"),
        key = "k", time = "t", value = "x")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap

  private def ew(rows: Seq[(String, Long, Long)], alpha: Double) =
    Timeseries.ewma(rows.toDF("k", "t", "x"),
        key = "k", time = "t", value = "x", alpha = alpha)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("z-scores hand-computed: mean 1, sigma 1 over {0,2} repeated") {
    // series 0,2,0,2: mean 1, population var 1 → z = ±1 exactly
    val got = z(Seq(("a", 1L, 0L), ("a", 2L, 2L), ("a", 3L, 0L), ("a", 4L, 2L)))
    assert(got == Map(("a", 1L) -> Some(-1.0), ("a", 2L) -> Some(1.0),
      ("a", 3L) -> Some(-1.0), ("a", 4L) -> Some(1.0)))
  }

  test("constant series scores NULL, never NaN or a divide-by-zero") {
    val got = z(Seq(("c", 1L, 7L), ("c", 2L, 7L), ("c", 3L, 7L)))
    assert(got.values.forall(_.isEmpty))
  }

  test("integer-lifted z equals the naive (x-mean)/sigma within fp tolerance, per key") {
    val rnd = new scala.util.Random(3)
    val rows = for (k <- Seq("a", "b"); t <- 1L to 50L)
      yield (k, t, rnd.nextInt(1000).toLong)
    val byKey = rows.groupBy(_._1)
    val got = z(rows)
    byKey.foreach { case (k, xs) =>
      val n = xs.size.toDouble
      val mean = xs.map(_._3).sum / n
      val sigma = math.sqrt(xs.map(x => (x._3 - mean) * (x._3 - mean)).sum / n)
      xs.foreach { case (_, t, x) =>
        val expected = (x - mean) / sigma
        assert(math.abs(got((k, t)).get - expected) < 1e-9, s"($k,$t)")
      }
    }
  }

  test("z-scores are scoped per key (one key's outliers don't leak into another's)") {
    val got = z(Seq(("a", 1L, 0L), ("a", 2L, 2L), ("b", 1L, 100L), ("b", 2L, 300L)))
    assert(got(("a", 1L)) == Some(-1.0) && got(("b", 1L)) == Some(-1.0))
  }

  test("ewma hand-computed at alpha 0.5, seeded with the first value") {
    // xs sorted by t: 4, 8, 2 → s0=4; s1=.5*8+.5*4=6; s2=.5*2+.5*6=4
    val got = ew(Seq(("a", 3L, 2L), ("a", 1L, 4L), ("a", 2L, 8L)), 0.5)
    assert(got == Map("a" -> ((3L, 4.0))))
  }

  test("ewma is the time-sorted fold regardless of arrival order; single point is itself") {
    val rows = Seq(("a", 2L, 10L), ("a", 1L, 20L), ("a", 4L, 30L),
      ("a", 3L, 40L), ("b", 9L, 5L))
    val got = ew(scala.util.Random.shuffle(rows.toList), 0.3)
    val sorted = Seq(20.0, 10.0, 40.0, 30.0)
    val expected = sorted.tail.foldLeft(sorted.head)((acc, x) =>
      0.3 * x + (1.0 - 0.3) * acc)
    assert(got("a") == ((4L, expected)))
    assert(got("b") == ((1L, 5.0)))
  }

  test("ewma at alpha 1 is the last value; alpha near 0 stays near the first") {
    val rows = Seq(("a", 1L, 100L), ("a", 2L, 0L), ("a", 3L, 50L))
    assert(ew(rows, 1.0)("a") == ((3L, 50.0)))
    val (_, lowAlpha) = ew(rows, 0.001)("a")
    assert(math.abs(lowAlpha - 100.0) < 1.0)
  }
}
