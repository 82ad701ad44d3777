package graft.expressions

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** ieee_ln must be java.lang.Math.log bit-for-bit through BOTH execution
  * paths (whole-stage codegen emits the literal Math.log call; the
  * interpreted path calls it directly), including the argument ranges
  * where StrictMath/fdlibm — Spark's own log() — diverges in the last
  * ulp (small probability ratios, the DSIR regression). */
class Ieee754LnSpec extends SparkSpecBase {
  import spark.implicits._

  test("ieee_ln ≡ java.lang.Math.log bitwise on a seeded argument sweep") {
    val rnd = new scala.util.Random(42)
    // probability-ratio-like magnitudes plus broad exponents and edges
    val xs = Seq.fill(4000)(rnd.nextDouble() * math.pow(10.0, rnd.nextInt(12) - 6)) ++
      Seq(1.0, 0.5, 2.0, 1e-300, 1e300, Double.MinPositiveValue)
    val got = xs.toDF("x")
      .select(col("x"), TextFunctions.ieeeLn(col("x")).as("l"))
      .as[(Double, Double)].collect()
    got.foreach { case (x, l) =>
      assert(java.lang.Double.doubleToLongBits(l) ==
        java.lang.Double.doubleToLongBits(java.lang.Math.log(x)), s"x=$x")
    }
  }

  test("null in → null out; non-positive args follow Math.log exactly") {
    val got = Seq[(java.lang.Long, Option[Double])](
      (1L, Some(0.0)), (2L, Some(-1.0)), (3L, None))
      .toDF("id", "x")
      .select(col("id"), TextFunctions.ieeeLn(col("x")).as("l"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq.sortBy(_._1)
    assert(got(0)._2.get.isNegInfinity) // ln(0) = -inf
    assert(got(1)._2.get.isNaN)         // ln(-1) = NaN
    assert(got(2)._2.isEmpty)           // null propagates
  }
}
