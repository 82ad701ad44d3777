package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpecBase {
  import spark.implicits._

  test("kAnonymityRisk hand case: group sizes 3/1/2 at thresholds 2/3/4") {
    val rows = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1))
      .toDF("x", "y")
    val got = Privacy.kAnonymityRisk(rows, Seq(col("x"), col("y")),
        Seq(2, 3, 4)).orderBy("k")
      .as[(Long, Long, Long)].collect().toSeq
    // k=2: only the size-1 group is below (1 row at risk); k=3: the
    // size-1 and size-2 groups (3 rows); k=4: every group (all 6 rows)
    assert(got == Seq((2L, 1L, 1L), (3L, 2L, 3L), (4L, 3L, 6L)))
  }

  test("kAnonymityRisk: a fully k-anonymous table reports 0, not null") {
    val rows = Seq(("a", 1), ("a", 1)).toDF("x", "y")
    val got = Privacy.kAnonymityRisk(rows, Seq(col("x"), col("y")), Seq(2))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 0L, 0L)))
  }
}
