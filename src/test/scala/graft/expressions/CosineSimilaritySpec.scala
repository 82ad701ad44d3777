package graft.expressions

import graft.SparkSpecBase
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The native codegen'd cosine must be BIT-identical to the composable HOF
  * form on real data, and agree on every null/edge case. */
class CosineSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("native ≡ HOF cosine bit-for-bit on all sf0.001 embedding pairs vs query 0") {
    val e = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val both = e.crossJoin(q)
      .select(
        VectorFunctions.cosine(col("embedding"), col("q_emb")).as("native"),
        VectorFunctions.cosineHof(col("embedding"), col("q_emb")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val n = java.lang.Double.doubleToRawLongBits(r.getDouble(0))
      val h = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      assert(n == h, s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("edge cases: zero vector, length mismatch, null element, null array") {
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)), // zero norm
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)) // length mismatch
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
    // null element and null array
    val withNulls = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c1,
        |       cosine_sim(CAST(NULL AS ARRAY<FLOAT>),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c2""".stripMargin)
      .collect()(0)
    assert(withNulls.isNullAt(0) && withNulls.isNullAt(1))
  }

  test("registered as SQL function cosine_sim via GraftExtensions") {
    Tables.embeddings(spark, sf0001).limit(5).createOrReplaceTempView("emb_sql_test")
    val out = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_sql_test a JOIN emb_sql_test b ON b.vec_id = 0
        |ORDER BY a.vec_id""".stripMargin).collect()
    assert(out.length == 5)
    val self = out.find(_.getLong(0) == 0L).get.getDouble(1)
    assert(math.abs(self - 1.0) < 1e-12) // self-similarity
  }

  test("mixed float/double array inputs work") {
    val out = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS c""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(out - 1.0) < 1e-12)
  }

  test("interpreted eval path agrees with codegen (expression.eval)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    def arr(xs: Double*) = Literal.create(ArrayData.toArrayData(xs.toArray),
      ArrayType(DoubleType, containsNull = false))
    val e = CosineSimilarity(arr(1.0, 2.0, 3.0), arr(-1.0, 0.5, 2.0))
    val got = e.eval(null).asInstanceOf[Double]
    val d = 1.0 * -1.0 + 2.0 * 0.5 + 3.0 * 2.0
    val exp = d / (math.sqrt(14.0) * math.sqrt(1.0 + 0.25 + 4.0))
    assert(math.abs(got - exp) < 1e-12)
  }
}
