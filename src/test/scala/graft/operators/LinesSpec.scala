package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LinesSpec extends SparkSpecBase {
  import spark.implicits._

  test("first corpus occurrence survives; later docs and positions drop") {
    val docs = Seq(
      (1L, "alpha\n  beta \n\ngamma"), // blank line keeps its slot (pos 2)
      (2L, "beta\ndelta\nalpha"),      // beta/alpha are repeats, delta new
      (3L, "delta"))                   // repeat
      .toDF("doc_id", "text")
    val got = Lines.dedupLines(docs).orderBy("doc_id", "line_no")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "alpha"), (1L, 1L, "beta"), (1L, 3L, "gamma"),
      (2L, 1L, "delta")))
  }

  test("within-doc repeats also collapse to the first position") {
    val docs = Seq((5L, "x\ny\nx\nx")).toDF("doc_id", "text")
    val got = Lines.dedupLines(docs).orderBy("line_no")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((5L, 0L, "x"), (5L, 1L, "y")))
  }

  test("null / empty / whitespace-only texts contribute nothing") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]), (2L, ""), (3L, "  \n\t\n"), (4L, "keep"))
      .toDF("doc_id", "text")
    val got = Lines.dedupLines(docs).as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((4L, 0L, "keep")))
  }
}
