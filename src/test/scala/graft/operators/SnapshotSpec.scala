package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpecBase {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, null.asInstanceOf[String], 40L))
    .toDF("id", "s", "v")

  test("added / removed / changed classified; unchanged dropped") {
    val newDf = Seq(
      (1L, "a", 10L),   // unchanged → dropped
      (2L, "b2", 20L),  // changed (s)
      (4L, null.asInstanceOf[String], 40L), // unchanged (null == null) → dropped
      (9L, "z", 90L))   // added; 3 removed
      .toDF("id", "s", "v")
    val got = Snapshot.diff(oldDf, newDf, Seq("id")).orderBy("id")
      .select("id", "change", "old_s", "new_s", "old_v", "new_v")
      .as[(Long, String, Option[String], Option[String], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (2L, "C", Some("b"), Some("b2"), Some(20L), Some(20L)),
      (3L, "R", Some("c"), None, Some(30L), None),
      (9L, "A", None, Some("z"), None, Some(90L))))
  }

  test("null transitions count as changes (null-safe compare)") {
    val newDf = Seq(
      (1L, null.asInstanceOf[String], 10L), // a → null: changed
      (2L, "b", 20L), (3L, "c", 30L),
      (4L, "now-set", 40L))                 // null → value: changed
      .toDF("id", "s", "v")
    val got = Snapshot.diff(oldDf, newDf, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, "C"), (4L, "C")))
  }

  test("identical snapshots diff to empty; compared set is the shared non-key columns") {
    assert(Snapshot.diff(oldDf, oldDf, Seq("id")).count() == 0)
    // extra column on one side is ignored, not compared
    val widened = oldDf.withColumn("extra", lit(1))
    val d = Snapshot.diff(widened, oldDf, Seq("id"))
    assert(d.count() == 0 && !d.columns.contains("old_extra"))
  }
}
