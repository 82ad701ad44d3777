package graft.expressions

import graft.SparkSpecBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The native in-order array sum must be BIT-identical to the interpreted
  * `aggregate` HOF it replaced (pagerank/HITS folds, tf-idf norms/dots,
  * rfm monetary), and agree on every null/edge case. */
class ArrayFieldSumSpec extends SparkSpecBase {
  import spark.implicits._

  test("native ≡ HOF struct-field sum bit-for-bit on random sorted folds") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => (rnd.nextLong() % 1000,
        rnd.nextDouble() * 2e3 - 1e3)).toSeq
    }
    val df = rows.toDF("xs")
      .select(sort_array(col("xs")).as("xs"))
    val got = df.select(
        VectorFunctions.fieldSum(col("xs"), 1).as("native"),
        aggregate(col("xs"), lit(0.0d),
          (a, x) => a + x.getField("_2")).as("hof"),
        VectorFunctions.fieldSumSq(col("xs"), 1).as("native_sq"),
        aggregate(col("xs"), lit(0.0d),
          (a, x) => a + x.getField("_2") * x.getField("_2")).as("hof_sq"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"sum ${r.getDouble(0)} != ${r.getDouble(1)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"sumsq ${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("native ≡ HOF element sum on array<double>, incl. empty") {
    val rnd = new scala.util.Random(11)
    val rows = (0 to 200).map { i =>
      (1 to (i % 17)).map(_ => rnd.nextDouble() * 1e6 - 5e5).toSeq
    }
    val got = rows.toDF("xs")
      .select(sort_array(col("xs")).as("xs"))
      .select(
        VectorFunctions.elemSum(col("xs")).as("native"),
        aggregate(col("xs"), lit(0.0d), (a, x) => a + x).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null propagation matches the fold: null element/field → null, null array → null") {
    val arrWithNullField =
      array(struct(lit(1L).as("k"), lit(1.5d).as("v")),
        struct(lit(2L).as("k"), lit(null).cast("double").as("v")))
    val row = Seq(1).toDF("one").select(
        VectorFunctions.fieldSum(arrWithNullField, 1).as("native"),
        aggregate(arrWithNullField, lit(0.0d),
          (a, x) => a + x.getField("v")).as("hof"),
        VectorFunctions.elemSum(lit(null).cast("array<double>"))
          .as("null_arr"),
        VectorFunctions.elemSum(array().cast("array<double>")).as("empty"))
      .collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1), "null field → null, both")
    assert(row.isNullAt(2), "null array → null")
    assert(row.getDouble(3) == 0.0, "empty array → 0.0")
  }
}
