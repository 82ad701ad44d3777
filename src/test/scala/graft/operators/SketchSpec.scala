package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** KMV sketch: exact below k, sane estimates above k, partition-order
  * invariance (mergeability), duplicate insensitivity. */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  private val M = 2147483647.0

  private def refKmv(k: Int, hashes: Seq[Long]): Double = {
    val mins = hashes.distinct.sorted.take(k)
    if (mins.size < k) mins.size.toDouble
    else ((k - 1).toDouble * M) / mins.last.toDouble
  }

  test("exact when distinct < k; duplicates don't inflate the count") {
    val hvs = Seq(5L, 9L, 5L, 9L, 123L, 9L)
    val got = hvs.toDF("hv").agg(Sketch.kmvDistinct(16)(col("hv"))).as[Double].head()
    assert(got == 3.0)
  }

  test("estimator branch matches the plain-Scala reference; order-invariant") {
    val rnd = new scala.util.Random(17)
    val hvs = Seq.fill(5000)((rnd.nextDouble() * M).toLong)
    val want = refKmv(32, hvs)
    for (parts <- Seq(1, 7, 32)) { // merge order must not matter
      val got = hvs.toDF("hv").repartition(parts)
        .agg(Sketch.kmvDistinct(32)(col("hv"))).as[Double].head()
      assert(got == want, s"parts=$parts")
    }
    // sanity: the estimate is in the right ballpark for uniform hashes
    assert(math.abs(want - hvs.distinct.size) / hvs.distinct.size.toDouble < 0.5)
  }
}
