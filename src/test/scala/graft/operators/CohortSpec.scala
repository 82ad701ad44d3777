package graft.operators

import graft.SparkSpecBase

class CohortSpec extends SparkSpecBase {
  import spark.implicits._

  // unitsPerBucket = 10, bucketsPerPeriod = 7 → "day" = t div 10,
  // "week" = days div 7, offsets in entity-relative weeks
  private def grid(rows: Seq[(String, Long)]) =
    Cohort.retention(rows.toDF("u", "t"), key = "u", time = "t",
      unitsPerBucket = 10L, bucketsPerPeriod = 7)

  test("hand-computed triangle: cohort by first day, offsets entity-relative") {
    // u1 first day 0 (cohort week 0): active days 0, 6 (offset 0), 7 (offset 1)
    // u2 first day 7 (cohort week 1): active days 7, 20 → offsets 0, 1
    val got = grid(Seq(
        ("u1", 0L), ("u1", 65L), ("u1", 70L),
        ("u2", 70L), ("u2", 205L)))
      .orderBy("cohort_period", "period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("several active days in one period count the entity once") {
    // days 0..6 all sit in offset week 0 → one (0,0) row counting 1
    val got = grid((0L to 6L).map(d => ("u", d * 10)))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L)))
  }

  test("cohorts aggregate distinct entities, not activity volume") {
    // 3 users born day 0; only 2 return in week 1 — the retention drop
    val got = grid(Seq(
        ("a", 0L), ("b", 0L), ("c", 0L),
        ("a", 70L), ("b", 75L)))
      .orderBy("period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 3L), (0L, 1L, 2L)))
  }

  test("duplicate events collapse before anything else (distinct user-day)") {
    val got = grid(Seq.fill(100)(("u", 5L)) ++ Seq.fill(50)(("u", 71L)))
      .orderBy("period_offset").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 1L)))
  }

  test("invalid bucket sizing is rejected") {
    val df = Seq(("u", 0L)).toDF("u", "t")
    intercept[IllegalArgumentException] { Cohort.retention(df, "u", "t", 0L, 7) }
    intercept[IllegalArgumentException] { Cohort.retention(df, "u", "t", 10L, 0) }
  }
}
