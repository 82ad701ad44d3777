package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpecBase {
  import spark.implicits._
  import Quality._

  // (id, val, cat) with planted defects: one null id, one dup id pair, one
  // out-of-range val, one bad category, nulls in val/cat (NOT violations)
  private lazy val child = Seq[(Option[Long], Option[Double], Option[String])](
    (Some(1L), Some(5.0), Some("a")),
    (Some(2L), Some(-1.0), Some("b")),   // range violation (lo=0)
    (Some(2L), Some(3.0), Some("zz")),   // dup id + bad category
    (Some(9L), None, None),              // nulls are NOT range/set violations
    (None, Some(2.0), Some("a")))        // null id: not-null + NOT an FK violation
    .toDF("id", "v", "cat")

  private lazy val parent = Seq(1L, 2L).toDF("pid")

  test("audit counts each rule exactly, in rule order, off one scan") {
    val rep = Quality.audit(child, Seq(
      NotNull("id"),
      Range("v", lo = Some(0.0), hi = Some(4.0)),
      InSet("cat", Seq("a", "b")),
      Unique(Seq("id")),
      ForeignKey("id", parent, "parent", "pid")))
    val rows = rep.as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(
      ("not_null:id", 1L, 5L),
      ("range:v", 2L, 5L),       // -1.0 below lo, 5.0 above hi
      ("in_set:cat", 1L, 5L),
      // ids (1,2,2,9,null): 5 − 3 distinct non-null = 2 — the dup row AND
      // the null-keyed row (a null key can't be asserted unique; both
      // engines' count(DISTINCT) skip it, so the formula flags it)
      ("unique:id", 2L, 5L),
      ("fk:id->parent.pid", 1L, 5L)))  // id=9 orphan; null id not counted
  }

  test("a clean table reports zero violations everywhere") {
    val clean = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "cat")
    val rep = Quality.audit(clean, Seq(
      NotNull("id"), Range("v", Some(0.0), Some(10.0)),
      InSet("cat", Seq("a", "b")), Unique(Seq("id")),
      ForeignKey("id", parent, "parent", "pid")))
    assert(rep.as[(String, Long, Long)].collect().forall(_._2 == 0L))
  }

  test("multi-column unique counts rows beyond the first per key pair") {
    val t = Seq((1L, 1), (1L, 1), (1L, 1), (1L, 2), (2L, 1)).toDF("a", "b")
    val rep = Quality.audit(t, Seq(Unique(Seq("a", "b"))))
      .as[(String, Long, Long)].collect()
    assert(rep.toSeq == Seq(("unique:a,b", 2L, 5L)))
  }

  test("the non-FK bundle folds into one partially-aggregated scan") {
    val rep = Quality.audit(child, Seq(
      NotNull("id"), Range("v", Some(0.0), None), Unique(Seq("id"))))
    val plan = rep.queryExecution.executedPlan.toString
    // one source scan feeds the whole report (explode over one agg row)
    assert("LocalTableScan".r.findAllIn(plan).size == 1, plan)
  }
}
