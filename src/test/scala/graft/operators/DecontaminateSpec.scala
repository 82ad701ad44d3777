package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted contamination: verbatim leak scores 1.0, partial leak the exact fraction, clean doc 0") {
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // verbatim benchmark leak
      (2L, "alpha beta gamma something else entirely here now"), // shares 1 shingle
      (3L, "completely unrelated words with zero shared trigrams at all"))
      .toDF("doc_id", "text")
    val got = Decontaminate.overlapStats(train, evalDocs, k = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_sh", "n_overlap", "overlap_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: 4 shingles, all in eval; doc 2: 6 shingles, exactly
    // "alpha beta gamma" shared; doc 3: nothing shared
    assert(got == Seq(
      (1L, 4L, 4L, 1.0),
      (2L, 6L, 1L, 1.0 / 6.0),
      (3L, 7L, 0L, 0.0)))
  }

  test("hashed and raw-string shingle paths agree on the sf0.001 corpus split") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val hashed = Decontaminate.overlapStats(train, evalDocs, hashShingles = true)
      .orderBy("doc_id").collect().toSeq
    val raw = Decontaminate.overlapStats(train, evalDocs, hashShingles = false)
      .orderBy("doc_id").collect().toSeq
    assert(hashed == raw)
    assert(hashed.nonEmpty)
  }

  test("output covers EVERY train doc (zero-overlap rows included)") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val out = Decontaminate.overlapStats(train, evalDocs)
    assert(out.count() == train.count())
  }

  test("fuzzyOverlap ≡ brute-force hamming filter on the same signatures (pigeonhole recall)") {
    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val got = Decontaminate.fuzzyOverlap(train, evalDocs,
        bands = 4, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    Caches.releaseAll()
    // brute force: every (train, eval) signature pair, no banding — with
    // maxHamming 3 < 4 bands the banded join must find the SAME set
    def sigs(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        simhashSig(shingleHashes(col("text"), 3, portable = true)).as("sh"))
      .as[(Long, Long)].collect()
    val ts = sigs(train); val es = sigs(evalDocs)
    val ref = ts.flatMap { case (tid, tsh) =>
      val hams = es.map { case (_, esh) =>
        java.lang.Long.bitCount(tsh ^ esh) }.filter(_ <= 3)
      if (hams.isEmpty) None
      else Some((tid, hams.length.toLong, hams.min.toLong))
    }.toSet
    assert(got == ref)
    assert(got.nonEmpty, "the sf0.001 corpus has straddling planted pairs")
  }

  test("fuzzyOverlap: a verbatim benchmark copy is flagged at hamming 0") {
    val evalDocs = Seq(
      (700L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // verbatim leak
      (2L, "completely unrelated words with zero shared trigrams at all"))
      .toDF("doc_id", "text")
    val got = Decontaminate.fuzzyOverlap(train, evalDocs)
      .as[(Long, Long, Long)].collect().toSet
    Caches.releaseAll()
    assert(got.contains((1L, 1L, 0L)), s"verbatim copy must flag at 0: $got")
    assert(!got.exists(_._1 == 2L), "the clean doc must not be flagged")
  }
}
