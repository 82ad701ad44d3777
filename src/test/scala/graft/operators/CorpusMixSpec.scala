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
}
