package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def hist(df: org.apache.spark.sql.DataFrame) =
    Scd.history(df, key = "k", tsCol = "ts", tieCol = "tie", attrs = Seq("st"))
      .orderBy("k", "version")
      .as[(Long, String, Long, Long, Option[Long])].collect().toSeq

  test("runs collapse; valid_to chains to the next run's start; last is open") {
    val ev = Seq(
      (1L, 10L, 1L, "F"), (1L, 20L, 2L, "F"),  // same run
      (1L, 30L, 3L, "O"), (1L, 40L, 4L, "F"),  // back to F = a NEW run
      (2L, 15L, 5L, "P"))
      .toDF("k", "ts", "tie", "st")
    assert(hist(ev) == Seq(
      (1L, "F", 1L, 10L, Some(30L)),
      (1L, "O", 2L, 30L, Some(40L)),
      (1L, "F", 3L, 40L, None),
      (2L, "P", 1L, 15L, None)))
  }

  test("same-timestamp events order by the tie column deterministically") {
    val ev = Seq((1L, 10L, 2L, "O"), (1L, 10L, 1L, "F"))
      .toDF("k", "ts", "tie", "st")
    assert(hist(ev) == Seq(
      (1L, "F", 1L, 10L, Some(10L)),   // tie 1 first → F opens, closes at 10
      (1L, "O", 2L, 10L, None)))
  }

  test("null attribute transitions are changes (null-safe compare)") {
    val ev = Seq(
      (1L, 10L, 1L, "F"), (1L, 20L, 2L, null.asInstanceOf[String]),
      (1L, 30L, 3L, null.asInstanceOf[String]), (1L, 40L, 4L, "F"))
      .toDF("k", "ts", "tie", "st")
    val got = Scd.history(ev, "k", "ts", "tie", Seq("st"))
      .orderBy("version")
      .select("st", "version", "valid_from", "valid_to")
      .as[(Option[String], Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (Some("F"), 1L, 10L, Some(20L)),
      (None, 2L, 20L, Some(40L)),      // null run collapses, then closes
      (Some("F"), 3L, 40L, None)))
  }

  test("multi-attribute change detection: any differing column opens a run") {
    val ev = Seq(
      (1L, 10L, 1L, "F", "a"), (1L, 20L, 2L, "F", "b"), (1L, 30L, 3L, "F", "b"))
      .toDF("k", "ts", "tie", "st", "seg")
    val got = Scd.history(ev, "k", "ts", "tie", Seq("st", "seg"))
      .orderBy("version").select("st", "seg", "version")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("F", "a", 1L), ("F", "b", 2L)))
  }
}
