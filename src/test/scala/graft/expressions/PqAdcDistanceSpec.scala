package graft.expressions

import graft.SparkSpecBase
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The native ADC distance must be BIT-identical to a plain-Scala
  * reconstruct-and-accumulate reference on real data, and honor the
  * null contract on every malformed input. */
class PqAdcDistanceSpec extends SparkSpecBase {
  import spark.implicits._

  // two deliberately ragged codebooks: m=2 subspaces over dim 4,
  // different ksub per subspace
  private val books: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, -1.0), Seq(0.5, 2.0)),
    Seq(Seq(2.0, 2.0), Seq(-3.0, 0.25)))

  /** Reference: same accumulation order as the expression — one running
    * total, subspaces outer, dims inner. */
  private def ref(q: Array[Double], codes: Array[Int]): Double = {
    var total = 0.0; var off = 0
    for (mi <- books.indices) {
      val c = books(mi)(codes(mi))
      for (j <- c.indices) { val d = q(off + j) - c(j); total += d * d }
      off += books(mi).head.size
    }
    total
  }

  test("native ≡ plain-Scala reference bit-for-bit on a randomized grid") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      (Array.fill(4)(rnd.nextFloat() * 4 - 2),
        Array(rnd.nextInt(3), rnd.nextInt(2)))
    }
    val got = rows.toDF("q", "codes")
      .select(VectorFunctions.pqAdc(col("q"), col("codes"), books).as("d"))
      .collect().map(_.getDouble(0))
    rows.zip(got).foreach { case ((q, codes), d) =>
      val e = ref(q.map(_.toDouble), codes)
      assert(java.lang.Double.doubleToRawLongBits(d) ==
        java.lang.Double.doubleToRawLongBits(e), s"$d != $e")
    }
  }

  test("null contract: wrong dims, bad/missing codes, null elements") {
    val out = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0, 0)),         // wrong query dim
      (Array(1.0f, 2.0f, 3.0f, 4.0f), Array(0)),      // wrong code count
      (Array(1.0f, 2.0f, 3.0f, 4.0f), Array(5, 0)),   // code out of range
      (Array(1.0f, 2.0f, 3.0f, 4.0f), Array(-1, 0)))  // negative code
      .toDF("q", "codes")
      .select(VectorFunctions.pqAdc(col("q"), col("codes"), books).as("d"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
    val qNull = array(lit(1.0f), lit(null).cast("float"), lit(3.0f), lit(4.0f))
    val qOk = array(lit(1.0f), lit(2.0f), lit(3.0f), lit(4.0f))
    val codeNull = array(lit(null).cast("int"), lit(0))
    val codeOk = array(lit(0), lit(0))
    val nulls = spark.range(1).select(
      VectorFunctions.pqAdc(qNull, codeOk, books).as("a"),  // null query elem
      VectorFunctions.pqAdc(qOk, codeNull, books).as("b"))  // null code
      .collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("double-element query arrays accepted; exact zero at a centroid") {
    val got = Seq((Array(1.0, -1.0, -3.0, 0.25), Array(1, 1)))
      .toDF("q", "codes")
      .select(VectorFunctions.pqAdc(col("q"), col("codes"), books).as("d"))
      .collect()(0).getDouble(0)
    assert(got == 0.0)
  }

  test("sf0.001 embeddings: ADC of own codes equals reconstruction error ≥ 0") {
    val emb = Tables.embeddings(spark, sf0001)
    val idx = graft.operators.Similarity.buildPqIndex(emb, m = 4, ksub = 16)
    try {
      val joined = emb.select(col("vec_id").as("neighbor_id"),
          col("embedding"))
        .join(idx.encoded, "neighbor_id")
        .select(VectorFunctions.pqAdc(col("embedding"), col("codes"),
          idx.codebooks).as("d"))
        .collect()
      assert(joined.nonEmpty && joined.forall(r => !r.isNullAt(0) && r.getDouble(0) >= 0.0))
    } finally idx.release(blocking = true)
  }
}
