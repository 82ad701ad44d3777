package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class IvmSpec extends SparkSpecBase {
  import spark.implicits._

  private def aggOf(rows: Seq[(Long, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long)].collect().toSeq.sorted

  test("mergeAdditive(base, delta) ≡ from-scratch aggregate (the IVM law)") {
    val rnd = new scala.util.Random(3)
    val all = Seq.fill(500)((rnd.nextInt(30).toLong, rnd.nextInt(100).toLong))
    val (base, delta) = all.partition(_._2 % 10 != 0)
    val merged = Ivm.mergeAdditive(aggOf(base), aggOf(delta), "k", Seq("n", "s"))
    assert(collect(merged) == collect(aggOf(all)))
  }

  test("keys present on only one side survive with the other side as zero") {
    val base = aggOf(Seq((1L, 5L), (1L, 7L), (2L, 1L)))
    val delta = aggOf(Seq((2L, 9L), (3L, 4L)))
    val got = collect(Ivm.mergeAdditive(base, delta, "k", Seq("n", "s")))
    assert(got == Seq((1L, 2L, 12L), (2L, 2L, 10L), (3L, 1L, 4L)))
  }

  test("empty delta is the identity; empty base reduces to the delta") {
    val base = aggOf(Seq((1L, 2L), (2L, 3L)))
    val none = aggOf(Seq.empty[(Long, Long)])
    assert(collect(Ivm.mergeAdditive(base, none, "k", Seq("n", "s"))) ==
      collect(base))
    assert(collect(Ivm.mergeAdditive(none, base, "k", Seq("n", "s"))) ==
      collect(base))
  }
}
