package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(-1.0f, 0.5f, 2.0f)

  private def refDot(x: Array[Float], y: Array[Float]): Double =
    x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum

  test("dot / normSq / cosine / l2Sq match plain math") {
    val df = Seq((a, b)).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.normSq(col("a")),
      VectorFunctions.cosine(col("a"), col("b")),
      VectorFunctions.l2Sq(col("a"), col("b"))).collect()(0)
    val d = refDot(a, b)
    assert(math.abs(row.getDouble(0) - d) < 1e-12)
    assert(math.abs(row.getDouble(1) - refDot(a, a)) < 1e-12)
    val cos = d / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))
    assert(math.abs(row.getDouble(2) - cos) < 1e-12)
    val l2 = a.zip(b).map { case (p, q) => val t = p.toDouble - q.toDouble; t * t }.sum
    assert(math.abs(row.getDouble(3) - l2) < 1e-12)
  }

  test("cosine of a zero vector is null, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val row = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()(0)
    assert(row.isNullAt(0))
  }

  test("hyperplane signature fails loudly on a dim mismatch (no silent zero sigs)") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val ex = intercept[Exception] {
      df.select(VectorFunctions.hyperplaneSignature(col("v"), 8, 1L, dim = 64)).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.toLowerCase.contains("hyperplane"))))
  }

  test("hyperplane signature: deterministic, seed-sensitive, locality-preserving") {
    val close = a.map(x => x * 1.01f)
    val far = Array(-3.0f, 1.0f, -2.0f)
    val df = Seq(("a", a), ("close", close), ("far", far)).toDF("id", "v")
    def sig(seed: Long) = df
      .select(col("id"), VectorFunctions.hyperplaneSignature(col("v"), 16, seed, dim = 3))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = sig(42L); val s2 = sig(42L); val s3 = sig(7L)
    assert(s1 == s2) // deterministic
    assert(s1 != s3) // seed changes the family
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(s1("a"), s1("close")) <= ham(s1("a"), s1("far")))
    assert(ham(s1("a"), s1("close")) <= 2) // near-parallel vectors ≈ same signs
  }
}
