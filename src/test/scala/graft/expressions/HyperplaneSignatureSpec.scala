package graft.expressions

import graft.SparkSpecBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Native HyperplaneSignature vs the composable HOF reference. */
class HyperplaneSignatureSpec extends SparkSpecBase {
  import spark.implicits._

  test("native hyperplane signature ≡ HOF twin on randomized vectors") {
    val rnd = new scala.util.Random(31)
    val vecs = (1 to 50).map(_ => Array.fill(16)((rnd.nextDouble() - 0.5).toFloat))
    val rows = vecs.toDF("v").select(
      VectorFunctions.hyperplaneSignature(col("v"), 32, 42L, 16).as("native"),
      VectorFunctions.hyperplaneSignatureHof(col("v"), 32, 42L, 16).as("hof"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == r.getLong(1), s"vector $i")
    }
  }

  test("identical vectors share a signature; dim mismatch fails loudly") {
    val v = Array.fill(8)(0.25f)
    val sigs = Seq(v, v).toDF("v")
      .select(VectorFunctions.hyperplaneSignature(col("v"), 16, 7L, 8))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    val bad = Seq(Array.fill(5)(1.0f)).toDF("v")
      .select(VectorFunctions.hyperplaneSignature(col("v"), 16, 7L, 8))
    assertThrows[Exception](bad.collect())
  }
}
