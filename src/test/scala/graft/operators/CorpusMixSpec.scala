package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CorpusMixSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)
    .select("doc_id", "text", "source")

  test("rate 1.0 keeps everything, rate 0.0 excludes the stratum entirely") {
    val n = docs.count()
    assert(CorpusMix.sampleByStratum(docs, "source", Map.empty).count() == n)
    val noSrc0 = CorpusMix.sampleByStratum(docs, "source", Map("src0" -> 0.0))
    assert(noSrc0.filter(col("source") === "src0").count() == 0)
    assert(noSrc0.count() ==
      n - docs.filter(col("source") === "src0").count())
  }

  test("the mix is deterministic and content-derived (duplicate texts decide identically)") {
    val rates = Map("src0" -> 0.3, "src1" -> 0.7)
    val a = CorpusMix.sampleByStratum(docs, "source", rates)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = CorpusMix.sampleByStratum(docs, "source", rates)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // plant exact copies under new ids in the SAME stratum: each copy must
    // land on the same side of the cut as its original
    val dupped = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 100000L))
    val kept = CorpusMix.sampleByStratum(dupped, "source", rates)
      .select("doc_id").as[Long].collect().toSet
    val origs = docs.select("doc_id").as[Long].collect().toSeq
    assert(origs.forall(id => kept.contains(id) == kept.contains(id + 100000L)))
  }

  test("realized fraction tracks the target rate (hash uniformity)") {
    // synthetic 4000-doc stratum with distinct texts; 0.3 target
    val synth = (1 to 4000).map(i =>
      (i.toLong, s"document number $i with some distinct words $i", "s")).toSeq
      .toDF("doc_id", "text", "source")
    val kept = CorpusMix.sampleByStratum(synth, "source", Map("s" -> 0.3)).count()
    val frac = kept.toDouble / 4000
    assert(math.abs(frac - 0.3) < 0.05, s"realized $frac vs target 0.3")
  }

  test("rates outside [0,1] are rejected") {
    intercept[IllegalArgumentException] {
      CorpusMix.sampleByStratum(docs, "source", Map("src0" -> 1.5))
    }
  }

  test("splits partition the corpus: every doc gets exactly one bucket") {
    val splits = Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)
    val assigned = CorpusMix.assignSplits(docs, splits)
    assert(assigned.count() == docs.count())
    assert(assigned.filter(col("split").isNull).count() == 0)
    assert(assigned.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // roughly 90/5/5 on distinct-text corpora (hash uniformity)
    val n = assigned.count().toDouble
    val trainFrac = assigned.filter(col("split") === "train").count() / n
    assert(math.abs(trainFrac - 0.90) < 0.07, s"train frac $trainFrac")
  }

  test("exact duplicates land in the SAME split (the leakage guarantee)") {
    val splits = Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)
    val dupped = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 100000L))
    val bySplit = CorpusMix.assignSplits(dupped, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val origs = docs.select("doc_id").as[Long].collect().toSeq
    assert(origs.forall(id => bySplit(id) == bySplit(id + 100000L)))
  }

  test("split fractions must quantize exactly and cover the domain") {
    intercept[IllegalArgumentException] {
      CorpusMix.assignSplits(docs, Seq("a" -> 0.5, "b" -> 0.4)) // sums to 0.9
    }
    intercept[IllegalArgumentException] {
      CorpusMix.assignSplits(docs, Seq("a" -> 0.999, "b" -> 0.001)) // 0.1 bucket at g=100
    }
  }

  test("temperatureWeights: α=0.5 flattening — bit law, Σq=1, boost direction") {
    import spark.implicits._
    // 80 / 15 / 5 docs across three strata
    val rows = (Seq.fill(80)("big") ++ Seq.fill(15)("mid") ++ Seq.fill(5)("low"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val got = CorpusMix.temperatureWeights(rows.toDF("doc_id", "src"), "src")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // replay the exact arithmetic: p in data order, z as the SORTED fold
    val n = Map("big" -> 80L, "mid" -> 15L, "low" -> 5L)
    val p = n.view.mapValues(_.toDouble / 100L.toDouble).toMap
    val z = p.toSeq.sortBy(_._1).map { case (_, pv) => math.sqrt(pv) }
      .foldLeft(0.0)(_ + _)
    for ((s, (_, nd, pg, qg, bg)) <- got) {
      assert(nd == n(s) && pg == p(s))
      assert(qg == math.sqrt(p(s)) / z, s)          // bit equality
      assert(bg == (math.sqrt(p(s)) / z) / p(s), s) // bit equality
    }
    // flattening: the dominant stratum is down-sampled, the rare one up
    assert(got("big")._5 < 1.0 && got("low")._5 > 1.0)
    // q is a distribution (within an ulp of 1 — assembled in map order)
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-12)
  }

  test("weightedSample: bit-equal to the A-ES replay; scale-invariant") {
    import spark.implicits._
    val P = 2147483647L
    val rows = (1L to 40L).map(i => (i, 10L + (i * 7L) % 90L))
    def key(id: Long, w: Long): Double =
      math.log(((id % P) * 48271L % P + 1L).toDouble / (P + 1L).toDouble) / w.toDouble
    val want = rows.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(10)
    val got = CorpusMix.weightedSample(rows.toDF("doc_id", "w"),
        "doc_id", "w", n = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)))
    got.zip(want).foreach { case (g, w) =>
      assert(java.lang.Double.doubleToLongBits(g._3) ==
        java.lang.Double.doubleToLongBits(w._3))
    }
    // scaling every weight by a positive constant preserves the selection
    val scaled = CorpusMix.weightedSample(
        rows.map { case (id, w) => (id, w * 13L) }.toDF("doc_id", "w"),
        "doc_id", "w", n = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(scaled.map(_._1) == got.map(_._1))
  }

  test("weightedSample: heavier weight can only improve a doc's rank") {
    import spark.implicits._
    val rows = (1L to 30L).map(i => (i, 50L))
    val base = CorpusMix.weightedSample(rows.toDF("doc_id", "w"),
      "doc_id", "w", n = 30).as[(Long, Long, Double)].collect().toSeq
    val rankOf = base.map(_._1).zipWithIndex.toMap
    // quadruple doc 17's weight: its key divides by 4 (toward 0) while
    // every other key is unchanged → its rank never worsens
    val boosted = CorpusMix.weightedSample(
      rows.map { case (id, w) => (id, if (id == 17L) w * 4 else w) }
        .toDF("doc_id", "w"),
      "doc_id", "w", n = 30).as[(Long, Long, Double)].collect().toSeq
    val rankB = boosted.map(_._1).zipWithIndex.toMap
    assert(rankB(17L) <= rankOf(17L))
    Caches.releaseAll()
  }
}
