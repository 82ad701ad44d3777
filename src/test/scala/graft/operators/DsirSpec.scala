package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private val M = 2147483647L
  private val B = 1024

  private def poly(s: String, mult: Long): Long = {
    var h = 17L
    s.foreach(c => h = (h * mult + c.toLong) % M)
    h
  }
  private def hash62(s: String): Long = poly(s, 31) | (poly(s, 37) << 31)

  /** ShingleHashes window semantics: <= k tokens → one whole-string
    * shingle, else k-token windows joined by single spaces. */
  private def shingles(text: String, k: Int): Seq[String] = {
    val ts = text.trim.split("\\s+", -1).toSeq
    if (ts.size <= k) Seq(ts.mkString(" "))
    else ts.sliding(k).map(_.mkString(" ")).toSeq
  }

  /** Plain-Scala replay of the whole DSIR weight computation — same
    * hashes, same smoothing, same bucket-ordered fold. */
  private def refWeights(docs: Seq[(Long, String, Boolean)]): Map[Long, Double] = {
    val feats: Seq[(Long, Boolean, Long)] = docs.flatMap { case (id, text, tgt) =>
      (shingles(text, 1) ++ shingles(text, 2))
        .map(s => (id, tgt, hash62(s) % B))
    }
    val perDoc: Map[(Long, Long), Long] = feats.groupBy(f => (f._1, f._3))
      .map { case (k, v) => k -> v.size.toLong }
    val cr: Map[Long, Long] = feats.groupBy(_._3).map { case (b, v) => b -> v.size.toLong }
    val ct: Map[Long, Long] = feats.filter(_._2).groupBy(_._3)
      .map { case (b, v) => b -> v.size.toLong }
    val rtot = cr.values.sum
    val ttot = ct.values.sum
    val wb: Map[Long, Double] = cr.map { case (b, c) =>
      b -> (math.log((ct.getOrElse(b, 0L) + 1L).toDouble / (ttot + B).toDouble)
        - math.log((c + 1L).toDouble / (rtot + B).toDouble))
    }
    docs.map { case (id, _, _) =>
      val mine = perDoc.collect { case ((d, b), k) if d == id => (b, k) }.toSeq
        .sortBy(_._1)
      var acc = 0.0
      mine.foreach { case (b, k) => acc = acc + k.toDouble * wb(b) }
      id -> acc
    }.toMap
  }

  private val corpus = Seq(
    (1L, "data spark table join data spark", true),
    (2L, "spark table data table spark scan", true),
    (3L, "data table scan spark join table", true),
    (4L, "der die das der die das und", false),
    (5L, "die das und der das die der", false),
    (6L, "data der spark die table das", false) // mixed
  )

  test("importanceWeights: bit-equal to the plain-Scala replay") {
    val docs = corpus.toDF("doc_id", "text", "en")
    val got = Caches.scoped {
      Dsir.importanceWeights(docs, col("en"), buckets = B)
        .as[(Long, Double)].collect().toMap
    }
    val want = refWeights(corpus)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, w) =>
      assert(java.lang.Double.doubleToLongBits(w) ==
        java.lang.Double.doubleToLongBits(want(id)), s"doc $id: $w vs ${want(id)}")
    }
  }

  test("select: target-distribution docs outrank off-distribution docs") {
    val docs = corpus.toDF("doc_id", "text", "en")
    val picked = Caches.scoped {
      Dsir.select(docs, col("en"), buckets = B, n = 3)
        .as[(Long, Double)].collect().toSeq
    }
    // the three target-vocabulary docs win; the mixed and German docs lose
    assert(picked.map(_._1).toSet == Set(1L, 2L, 3L))
    // and weights are ranked: every selected weight >= every rejected one
    val all = Caches.scoped {
      Dsir.importanceWeights(docs, col("en"), buckets = B)
        .as[(Long, Double)].collect().toMap
    }
    val rejected = all.view.filterKeys(k => !picked.map(_._1).contains(k))
    assert(picked.map(_._2).min >= rejected.values.max)
  }

  test("distributionShift: bit-equal replay; selection moves toward target") {
    val docs = corpus.toDF("doc_id", "text", "en")
    val got = Caches.scoped {
      Dsir.distributionShift(docs, col("en"), buckets = B, n = 3)
        .as[(Double, Double, Long)].collect().head
    }
    // plain-Scala replay over the raw bucket domain
    val feats: Seq[(Long, Boolean, Long)] = corpus.flatMap { case (id, text, tgt) =>
      (shingles(text, 1) ++ shingles(text, 2)).map(s => (id, tgt, hash62(s) % B))
    }
    val selIds = refWeights(corpus).toSeq
      .sortBy { case (id, w) => (-w, id) }.take(3).map(_._1).toSet
    val cr = feats.groupBy(_._3).map { case (b, v) => b -> v.size.toLong }
    val ct = feats.filter(_._2).groupBy(_._3).map { case (b, v) => b -> v.size.toLong }
    val cs = feats.filter(f => selIds.contains(f._1)).groupBy(_._3)
      .map { case (b, v) => b -> v.size.toLong }
    val (nr, nt, ns) = (cr.values.sum, ct.values.sum, cs.values.sum)
    def p(c: Long, n: Long) = (c + 1L).toDouble / (n + B).toDouble
    var klRaw = 0.0; var klSel = 0.0
    cr.keys.toSeq.sorted.foreach { b =>
      klRaw = klRaw + p(cr(b), nr) *
        math.log(p(cr(b), nr) / p(ct.getOrElse(b, 0L), nt))
      klSel = klSel + p(cs.getOrElse(b, 0L), ns) *
        math.log(p(cs.getOrElse(b, 0L), ns) / p(ct.getOrElse(b, 0L), nt))
    }
    assert(java.lang.Double.doubleToLongBits(got._1) ==
      java.lang.Double.doubleToLongBits(klRaw))
    assert(java.lang.Double.doubleToLongBits(got._2) ==
      java.lang.Double.doubleToLongBits(klSel))
    // the effect: selecting target-like docs moves the distribution in
    assert(got._3 == 1L && got._2 <= got._1)
  }

  test("hashedFeatures: counts are multiplicities, buckets in range") {
    val docs = Seq((9L, "a b a", true)).toDF("doc_id", "text", "en")
    // unigrams: a, b, a; bigrams: "a b", "b a" → features: a×2, b×1, ab×1, ba×1
    val got = Caches.scoped {
      Dsir.hashedFeatures(docs, col("en"), buckets = B)
        .as[(Long, Boolean, Long, Long)].collect().toSeq
    }
    assert(got.map(_._4).sum == 5L)
    assert(got.forall(r => r._3 >= 0 && r._3 < B))
    val aB = hash62("a") % B
    assert(got.find(_._3 == aB).map(_._4).contains(2L))
  }
}
