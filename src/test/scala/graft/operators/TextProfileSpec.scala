package graft.operators

import graft.SparkSpecBase

class TextProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("repetitionStats: hand-computed counts and fractions on planted docs") {
    val docs = Seq(
      (1L, "a a a b"),            // tokens: a×3, b×1; bigrams: "a a"×2, "a b"×1
      (2L, "x y z w"),            // all distinct; bigrams all distinct
      (3L, "spam spam spam spam") // fully repeated
    ).toDF("doc_id", "text")
    val got = TextProfile.repetitionStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 3L, 3.0 / 4.0, 3L, 2.0 / 3.0),
      (2L, 4L, 4L, 1L, 1.0 / 4.0, 3L, 1.0 / 3.0),
      (3L, 4L, 1L, 4L, 1.0, 3L, 1.0)))
  }

  test("corpusDupSpans: hand-computed across-doc span sharing") {
    val docs = Seq(
      (1L, "a b c d"),     // spans: "a b c", "b c d"
      (2L, "a b c x"),     // spans: "a b c" (shared w/ 1), "b c x"
      (3L, "z z z z z"),   // spans all "z z z" -> ONE distinct, unshared
      (4L, "q r"),         // <= k tokens -> whole doc is the single span
      (5L, "q r")          // exact dup of 4 -> both fully duplicated
    ).toDF("doc_id", "text")
    val got = Caches.scoped {
      TextProfile.corpusDupSpans(docs, k = 3).orderBy("doc_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
    }
    assert(got == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0),
      (4L, 1L, 1L, 1.0),
      (5L, 1L, 1L, 1.0)))
  }

  test("repetitionStats: <= k tokens collapse to one shingle (ShingleHashes rule)") {
    // a 2-token doc has ONE bigram shingle (the whole doc), and a 1-token
    // doc has one token — mirroring ShingleHashes' n <= k branch, which is
    // exactly what the DuckDB oracle's CASE arm reproduces
    val docs = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val got = TextProfile.repetitionStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1L, 1.0, 1L, 1.0),
      (2L, 2L, 2L, 1L, 0.5, 1L, 1.0)))
  }
}
