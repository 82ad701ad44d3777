package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ParetoSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand case: frontier keeps maxima, drops dominated, keeps ties") {
    val pts = Seq(
      (1L, 1, 10.0), (2L, 1, 5.0),   // (1,10) is per-x max; (1,5) dominated
      (3L, 2, 10.0),                 // dominates (1,10): same y, higher x
      (4L, 3, 7.0), (5L, 3, 7.0),    // frontier tie — both kept
      (6L, 4, 7.0),                  // dominates x=3's 7.0 (higher x, same y)
      (7L, 5, 2.0))                  // frontier: nothing has x>5
      .toDF("id", "x", "y")
    val got = Pareto.frontier2d(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 6L, 7L))
  }

  test("frontier law on random data: kept points undominated, dropped points dominated") {
    val rnd = new scala.util.Random(3)
    val pts = (1L to 300L).map(i => (i, rnd.nextInt(12), rnd.nextInt(40).toDouble))
    val df = pts.toDF("id", "x", "y")
    val kept = Pareto.frontier2d(df, "x", "y")
      .as[(Long, Int, Double)].collect().toSeq
    val keptIds = kept.map(_._1).toSet
    def dominates(a: (Int, Double), b: (Int, Double)) =
      a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)
    for ((id, x, y) <- pts.map(p => (p._1, p._2, p._3))) {
      val dominated = pts.exists(q => dominates((q._2, q._3), (x, y)))
      assert(keptIds.contains(id) == !dominated, s"point $id ($x,$y)")
    }
    assert(kept.nonEmpty)
  }
}
