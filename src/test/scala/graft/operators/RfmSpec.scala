package graft.operators

import graft.SparkSpecBase

class RfmSpec extends SparkSpecBase {
  import spark.implicits._

  // rows: (key, time, amount)
  private def rfm(rows: Seq[(Long, Long, Double)]) =
    Rfm.scores(rows.toDF("k", "t", "amt"), key = "k", time = "t",
        amount = "amt")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("hand-computed recency / frequency / monetary") {
    val got = rfm(Seq(
      (1L, 10L, 100.0), (1L, 30L, 50.0), (1L, 20L, 25.0),
      (2L, 5L, 7.5)))
    assert(got(1L) == ((30L, 3L, 175.0)))
    assert(got(2L) == ((5L, 1L, 7.5)))
  }

  test("monetary is the SORTED left fold — bit-equal to the plain-Scala twin") {
    // amounts chosen non-associative under reordering: 0.1-style doubles
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 1L to 20L; i <- 1 to rnd.nextInt(8) + 1)
      yield (k, i.toLong, rnd.nextDouble() * 1000.0 + 0.1)
    val expected = rows.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._3).sorted.foldLeft(0.0)(_ + _)
    }
    val got = rfm(scala.util.Random.shuffle(rows.toList))
    expected.foreach { case (k, m) => assert(got(k)._3 == m, s"key $k") }
  }

  test("one transaction per key degenerates to the row itself") {
    val got = rfm(Seq((1L, 42L, 9.25)))
    assert(got == Map(1L -> ((42L, 1L, 9.25))))
  }
}
