package graft

/**
 * Driver-contract guard: every registered query must execute end-to-end at
 * the smoke SF, and the oracle map must stay consistent with the query map.
 * This is the in-repo version of the driver's smoke gate — a query that
 * breaks here would zero its CORRECTNESS row before the driver ever runs.
 */
class QueriesSmokeSpec extends SparkSpecBase {

  test("oracleSql keys are exactly the SQL-expressible subset of queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    // rows-only queries are the documented exceptions (approximate-by-
    // construction ANN operating points whose output no SQL characterizes)
    val rowsOnly = q.diff(o)
    assert(rowsOnly ==
      Set("ann_topk_lsh", "ann_topk_ivf", "ann_topk_pq", "ann_topk_ivfpq",
        "ann_topk_ivfpq_res"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("query names are unique across tiers") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct)}")
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sf0001).write.format("noop").mode("overwrite").save()
        graft.operators.Caches.releaseAll()
        spark.catalog.clearCache()
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
