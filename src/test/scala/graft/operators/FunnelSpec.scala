package graft.operators

import graft.SparkSpecBase

class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  // (user, time, type) — hand-crafted coverage of every funnel edge:
  //  A: clean 3-step conversion inside both windows
  //  B: clicks too late (250 ∉ (100, 200]) → depth 1
  //  C: converts to click, purchase outside (150, 250] → depth 2
  //  D: events in REVERSE order (purchase, click before the view; nothing
  //     after) → depth 1 — out-of-order events neither help nor block
  //  E: clicks but never views → depth 0, absent from every step
  //  F: two in-window clicks (110, 105) → FIRST-touch takes 105
  private val events = Seq(
    ("A", 100L, "view"), ("A", 150L, "click"), ("A", 200L, "purchase"),
    ("B", 100L, "view"), ("B", 250L, "click"),
    ("C", 100L, "view"), ("C", 150L, "click"), ("C", 300L, "purchase"),
    ("D", 10L, "purchase"), ("D", 20L, "click"), ("D", 30L, "view"),
    ("E", 10L, "click"),
    ("F", 100L, "view"), ("F", 110L, "click"), ("F", 105L, "click")
  ).toDF("u", "t", "ty")

  private val steps = Seq("view", "click", "purchase")

  test("stepCounts: hand-computed depths, ordered windows, first touch") {
    val got = Caches.scoped {
      Funnel.stepCounts(events, "u", "t", "ty", steps, windowUnits = 100L)
        .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    }
    assert(got == Seq((1, "view", 5L), (2, "click", 3L), (3, "purchase", 1L)))
  }

  test("stepTimes: first-touch times, window edges half-open (t, t+w]") {
    val ts = Caches.scoped {
      val s = Funnel.stepTimes(events, "u", "t", "ty", steps, 100L)
      s.map(_.as[(String, Long)].collect().toMap)
    }
    assert(ts(0) == Map("A" -> 100L, "B" -> 100L, "C" -> 100L, "D" -> 30L, "F" -> 100L))
    // F: min over the clicks INSIDE the window (105, not 110); the exact
    // boundary t = prev + w converts (A's purchase at 200 = 150 + 50 ≤ 150+100)
    assert(ts(1) == Map("A" -> 150L, "C" -> 150L, "F" -> 105L))
    assert(ts(2) == Map("A" -> 200L))
  }

  test("monotone counts on random event streams; empty tail steps count 0") {
    val rnd = new scala.util.Random(11)
    val rand = (1 to 2000).map { _ =>
      (s"u${rnd.nextInt(40)}", rnd.nextInt(10000).toLong,
        Seq("view", "click", "purchase")(rnd.nextInt(3)))
    }.toDF("u", "t", "ty")
    val got = Caches.scoped {
      Funnel.stepCounts(rand, "u", "t", "ty", steps, windowUnits = 50L)
        .as[(Int, String, Long)].collect().toSeq.sortBy(_._1).map(_._3)
    }
    assert(got.size == 3 && got == got.sorted.reverse, s"non-monotone: $got")
    // a funnel whose first step never fires reports 0 at every step
    val none = Caches.scoped {
      Funnel.stepCounts(events, "u", "t", "ty", Seq("signup", "view"), 100L)
        .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    }
    assert(none == Seq((1, "signup", 0L), (2, "view", 0L)))
  }
}
