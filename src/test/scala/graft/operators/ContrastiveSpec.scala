package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ContrastiveSpec extends SparkSpecBase {
  import spark.implicits._

  private def pairs() = Contrastive.ictPairs(
    Tables.documents(spark, sf0001).select("doc_id", "text"), negatives = 2)
    .as[(Long, Long, Long, Long, String, String)].collect().toSeq

  test("one positive + k negatives per doc; negatives never hit the anchor") {
    val got = pairs()
    Caches.releaseAll()
    val n = got.map(_._1).distinct.size
    assert(got.size == 3 * n)
    val (pos, neg) = got.partition(_._3 == 1L)
    assert(pos.size == n && pos.forall(p => p._1 == p._2 && p._4 == 0L))
    assert(neg.size == 2 * n)
    assert(neg.forall(p => p._2 != p._1), "a negative sampled its own anchor")
    assert(neg.forall(p => p._2 >= 0 && p._2 < n), "partner outside id domain")
    // per anchor: exactly nix 0,1,2
    got.groupBy(_._1).values.foreach(g =>
      assert(g.map(_._4).sorted == Seq(0L, 1L, 2L)))
  }

  test("positive halves reconstruct the tokenized document; negatives use the PARTNER's passage") {
    val got = pairs()
    val texts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    Caches.releaseAll()
    val passageOf = got.filter(_._3 == 1L).map(p => p._1 -> p._6).toMap
    got.filter(_._3 == 1L).foreach { p =>
      val toks = texts(p._1).trim.split("\\s+").toSeq
      assert((p._5 + " " + p._6).split(" ").toSeq == toks)
      val halfLen = math.ceil(toks.size / 2.0).toLong
      assert(p._5.split(" ").length.toLong == halfLen)
    }
    got.filter(_._3 == 0L).foreach { p =>
      assert(p._6 == passageOf(p._2), "negative text_b is not partner's passage")
    }
  }

  test("docs under minTokens produce no pairs (and dense-id contract is on the caller)") {
    val tiny = Seq((0L, "one two three four five six"), (1L, "too short"))
      .toDF("doc_id", "text")
    val got = Contrastive.ictPairs(tiny, negatives = 1, minTokens = 4)
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    Caches.releaseAll()
    // doc 1 filtered; with one surviving doc there is no valid negative
    // (the operator guards the mod-(n−1) divisor) — only the positive ships
    assert(got == Seq((0L, 0L, 1L, 0L, "one two three", "four five six")))
  }
}
