package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** KMV sketch: exact below k, sane estimates above k, partition-order
  * invariance (mergeability), duplicate insensitivity. */
class SketchSpec extends SparkSpecBase {
  import spark.implicits._

  private val M = 2147483647.0

  private def refKmv(k: Int, hashes: Seq[Long]): Double = {
    val mins = hashes.distinct.sorted.take(k)
    if (mins.size < k) mins.size.toDouble
    else ((k - 1).toDouble * M) / mins.last.toDouble
  }

  test("exact when distinct < k; duplicates don't inflate the count") {
    val hvs = Seq(5L, 9L, 5L, 9L, 123L, 9L)
    val got = hvs.toDF("hv").agg(Sketch.kmvDistinct(16)(col("hv"))).as[Double].head()
    assert(got == 3.0)
  }

  test("estimator branch matches the plain-Scala reference; order-invariant") {
    val rnd = new scala.util.Random(17)
    val hvs = Seq.fill(5000)((rnd.nextDouble() * M).toLong)
    val want = refKmv(32, hvs)
    for (parts <- Seq(1, 7, 32)) { // merge order must not matter
      val got = hvs.toDF("hv").repartition(parts)
        .agg(Sketch.kmvDistinct(32)(col("hv"))).as[Double].head()
      assert(got == want, s"parts=$parts")
    }
    // sanity: the estimate is in the right ballpark for uniform hashes
    assert(math.abs(want - hvs.distinct.size) / hvs.distinct.size.toDouble < 0.5)
  }

  // ---- Misra-Gries frequent items ----

  private def runFreq(capacity: Int, items: Seq[String], parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(Sketch.freqItems(capacity)(col("item")).as("r"))
      .select(explode(col("r")).as("ic"))
      .select("ic.item", "ic.est").as[(String, Long)].collect().toMap

  test("freqItems: exact when capacity >= distinct, for any partitioning") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 7, 32)) {
      val got = runFreq(8, scala.util.Random.shuffle(items), parts)
      assert(got == truth, s"parts=$parts")
    }
  }

  test("freqItems: MG guarantee under eviction — est underestimates by at most n/(capacity+1)") {
    // adversarially skewed: 2 heavy keys drowned in 60 distinct light keys
    val rnd = new scala.util.Random(7)
    val items = rnd.shuffle(
      Seq.fill(400)("HEAVY1") ++ Seq.fill(300)("HEAVY2") ++
        (0 until 60).flatMap(i => Seq.fill(5)(s"light$i")))
    val n = items.size
    val capacity = 16
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 8)) {
      val got = runFreq(capacity, items, parts)
      assert(got.size <= capacity)
      got.foreach { case (k, est) =>
        assert(est <= truth(k), s"overestimate for $k")
        assert(est >= truth(k) - n / (capacity + 1), s"error bound broken for $k")
      }
      // every item with frequency above n/(capacity+1) must be present
      truth.filter(_._2 > n / (capacity + 1)).keys.foreach { k =>
        assert(got.contains(k), s"heavy hitter $k missing (parts=$parts)")
      }
    }
  }

  // ---- bounded-sample quantile sketch ----

  private def refQuantiles(k: Int, rows: Seq[(Long, Double)]): QuantileSummary = {
    val vs = rows.distinct.sorted.take(k).map(_._2).sorted.toIndexedSeq
    val m = vs.length
    def at(num: Int, den: Int) = vs((((m - 1).toLong * num) / den).toInt)
    QuantileSummary(m, at(1, 2), at(9, 10), at(99, 100))
  }

  private def runQuantiles(k: Int, rows: Seq[(Long, Double)], parts: Int): QuantileSummary =
    rows.toDF("hv", "v").repartition(parts)
      .agg(Sketch.quantileSketch(k)(col("hv"), col("v")).as("q"))
      .select("q.n_sample", "q.p50", "q.p90", "q.p99")
      .as[(Int, Double, Double, Double)].collect().map {
        case (m, a, b, c) => QuantileSummary(m, a, b, c)
      }.head

  test("quantileSketch: exact when k >= rows; order-invariant in both branches") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(800)(i => ((rnd.nextDouble() * M).toLong, rnd.nextDouble() * 1000))
    for (k <- Seq(64, 4096); parts <- Seq(1, 7, 32)) {
      val got = runQuantiles(k, rows, parts)
      assert(got == refQuantiles(k, rows), s"k=$k parts=$parts")
    }
    // k >= rows: sample is everything -> quantiles are the exact ones
    val exact = refQuantiles(4096, rows)
    val sortedVs = rows.map(_._2).sorted.toIndexedSeq
    assert(exact.n_sample == rows.size)
    assert(exact.p50 == sortedVs((rows.size - 1) / 2))
  }

  test("quantileSketch: uniform-by-hash sample lands near the true quantiles") {
    // values 1..20000 with row-identity hashes from a seeded RNG; a k=512
    // sample's p50/p90/p99 rank error should be well inside 3*sqrt(1/k)
    val rnd = new scala.util.Random(41)
    val rows = Seq.tabulate(20000)(i => ((rnd.nextDouble() * M).toLong, (i + 1).toDouble))
    val got = runQuantiles(512, rows, 16)
    def rankErr(est: Double, q: Double) = math.abs(est / 20000.0 - q)
    val tol = 3.0 / math.sqrt(512.0)
    assert(rankErr(got.p50, 0.5) < tol, s"p50=${got.p50}")
    assert(rankErr(got.p90, 0.9) < tol, s"p90=${got.p90}")
    assert(rankErr(got.p99, 0.99) < tol, s"p99=${got.p99}")
  }

  test("quantileSketch vs the in-engine exact point (quantile_exact's histogram) on real data") {
    // The sketch certified against the ENGINE's own exact percentiles, not
    // only DuckDB: per returnflag, run the k=256 sketch over l_quantity
    // and assert each estimate's TRUE cumulative rank (computed from the
    // same bounded-domain histogram the quantile_exact row aggregates)
    // sits within a generous sampling bound of its target. Deterministic:
    // the hash sample is a pure function of the data.
    import org.apache.spark.sql.functions.{col, concat_ws, count, lit}
    import graft.functions.TextFunctions
    import graft.sources.Tables
    val li = Tables.lineitem(spark, sf0001)
    val sk = li
      .select(col("l_returnflag").as("flag"),
        TextFunctions.fingerprint(
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))).as("hv"),
        col("l_quantity").as("v"))
      .groupBy("flag")
      .agg(Sketch.quantileSketch(256)(col("hv"), col("v")).as("q"))
      .select(col("flag"), col("q.p50"), col("q.p90"), col("q.p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val hist = li.select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("v"))
      .groupBy("flag", "v").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byFlag = hist.groupBy(_._1)
    val tol = 5.0 / math.sqrt(256.0) // ~0.31σ-scaled; deterministic, generous
    for ((flag, (p50, p90, p99)) <- sk) {
      val bins = byFlag(flag).map(t => (t._2, t._3)).sortBy(_._1)
      val n = bins.map(_._2).sum.toDouble
      // true cumulative rank fraction of an estimate within its population
      def cdf(x: Double): Double =
        bins.filter(_._1 <= x).map(_._2).sum / n
      for ((est, q) <- Seq((p50, 0.5), (p90, 0.9), (p99, 0.99)))
        assert(math.abs(cdf(est) - q) < tol,
          s"$flag: sketch est $est has true rank ${cdf(est)}, target $q")
    }
  }
}
