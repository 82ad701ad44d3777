package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("id", "s", "v")

  test("insert / update / delete / pass-through in one batch") {
    val changes = Seq(
      (2L, "U", "b2", 21L),  // update
      (3L, "D", null, 0L),   // delete
      (9L, "I", "i", 90L))   // insert
      .toDF("id", "op", "s", "v")
    val got = Merge.applyChanges(base, changes, "id")
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, "a", 10L),   // untouched
      (2L, "b2", 21L),  // updated payload
      (4L, "d", 40L),   // untouched
      (9L, "i", 90L)))  // inserted
  }

  test("empty change batch is identity; 'U' on a missing key upserts") {
    val none = Seq.empty[(Long, String, String, Long)].toDF("id", "op", "s", "v")
    assert(Merge.applyChanges(base, none, "id").orderBy("id")
      .as[(Long, String, Long)].collect().toSeq ==
      base.orderBy("id").as[(Long, String, Long)].collect().toSeq)

    val up = Seq((7L, "U", "x", 70L)).toDF("id", "op", "s", "v")
    val got = Merge.applyChanges(base, up, "id").filter(col("id") === 7L)
      .as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq((7L, "x", 70L)))
  }

  test("several changes on one key: the highest seq wins") {
    val changes = Seq(
      (2L, "U", "first", 1L, 1L),
      (2L, "D", null, 0L, 2L),
      (2L, "U", "last", 99L, 3L),  // winner
      (3L, "U", "upd", 31L, 1L),
      (3L, "D", null, 0L, 2L))     // winner: delete
      .toDF("id", "op", "s", "v", "seq")
    val got = Merge.applyChanges(base, changes, "id", seqCol = Some("seq"))
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, "a", 10L), (2L, "last", 99L), (4L, "d", 40L)))
  }

  test("payload-subset changes keep unlisted base columns (null on insert)") {
    val changes = Seq((2L, "U", 99L), (8L, "I", 80L)).toDF("id", "op", "v")
    val got = Merge.applyChanges(base, changes, "id")
      .orderBy("id").collect()
    val r2 = got.find(_.getLong(0) == 2L).get
    assert(r2.getString(1) == "b" && r2.getLong(2) == 99L) // s kept, v replaced
    val r8 = got.find(_.getLong(0) == 8L).get
    assert(r8.isNullAt(1) && r8.getLong(2) == 80L)         // s null on insert
  }

  test("change payload columns must exist in the base") {
    val bad = Seq((1L, "U", 5L)).toDF("id", "op", "nope")
    val e = intercept[IllegalArgumentException] {
      Merge.applyChanges(base, bad, "id")
    }
    assert(e.getMessage.contains("nope"))
  }
}
