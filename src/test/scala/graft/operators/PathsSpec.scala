package graft.operators

import graft.SparkSpecBase

class PathsSpec extends SparkSpecBase {
  import spark.implicits._

  // rows: (key, time, tieBreak, type)
  private def paths(rows: Seq[(Long, Long, Long, String)], len: Int) =
    Paths.topPaths(rows.toDF("k", "t", "tb", "ty"),
        key = "k", time = "t", tieBreak = "tb", typ = "ty", len = len)
      .as[(String, Long)].collect().toMap

  test("hand-computed journeys, ordered by time") {
    val got = paths(Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "buy"),
      (2L, 5L, 4L, "view"), (2L, 9L, 5L, "click"), (2L, 99L, 6L, "buy"),
      (3L, 1L, 7L, "view"), (3L, 2L, 8L, "exit")), len = 3)
    assert(got == Map("view>click>buy" -> 2L, "view>exit" -> 1L))
  }

  test("arrival order is irrelevant; the time order decides the path") {
    val inOrder = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"))
    assert(paths(scala.util.Random.shuffle(inOrder), 3) ==
      paths(inOrder, 3))
    assert(paths(inOrder, 3) == Map("a>b>c" -> 1L))
  }

  test("equal timestamps break by the unique tie-break column") {
    val got = paths(Seq((1L, 5L, 2L, "second"), (1L, 5L, 1L, "first")), 2)
    assert(got == Map("first>second" -> 1L))
  }

  test("journeys longer than len truncate; shorter ones keep their full path") {
    val got = paths(
      (1L to 5L).map(i => (1L, i, i, s"e$i")) ++ Seq((2L, 1L, 99L, "solo")), 3)
    assert(got == Map("e1>e2>e3" -> 1L, "solo" -> 1L))
  }

  test("counts partition the entity set (every key lands in exactly one path)") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 1L to 40L; i <- 1L to (rnd.nextInt(6) + 1).toLong)
      yield (k, i, k * 100 + i, Seq("a", "b", "c")(rnd.nextInt(3)))
    val got = paths(rows, 4)
    assert(got.values.sum == 40L)
  }
}
