package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables

class TfidfSpec extends SparkSpecBase {
  import spark.implicits._

  /** Plain-Scala reference: portable shingle hashes, tf·ln(N/df) weights,
    * norms/dots folded in ascending-hash order — the exact arithmetic the
    * operator promises. */
  private def reference(corpus: Seq[(Long, String)], k: Int = 3,
      maxDf: Int = 1000): Seq[(Long, Long, Double)] = {
    def polyFold(s: String, mult: Long): Long =
      s.codePoints().toArray.foldLeft(17L)((h, c) => (h * mult + c) % 2147483647L)
    def shingleList(text: String): Seq[Long] = {
      val ts = text.trim.split("\\s+").toSeq
      val raw = if (ts.size <= k) Seq(ts.mkString(" "))
        else ts.sliding(k).map(_.mkString(" ")).toSeq
      raw.map(t => polyFold(t, 31) | (polyFold(t, 37) << 31))
    }
    val tf: Map[(Long, Long), Long] = corpus
      .flatMap { case (id, t) => shingleList(t).map(h => (id, h)) }
      .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val df: Map[Long, Long] = tf.keys.toSeq.groupBy(_._2)
      .map { case (h, v) => h -> v.size.toLong }
      .filter(_._2 <= maxDf)
    val n = corpus.size.toDouble
    val w: Map[(Long, Long), Double] = tf.collect {
      case ((id, h), f) if df.contains(h) =>
        (id, h) -> f.toDouble * math.log(n / df(h).toDouble)
    }
    val norms: Map[Long, Double] = w.toSeq.groupBy(_._1._1).map { case (id, ws) =>
      id -> math.sqrt(ws.sortBy(_._1._2).foldLeft(0.0)((a, x) => a + x._2 * x._2))
    }
    val ids = corpus.map(_._1).sorted
    for {
      i <- ids.indices; j <- (i + 1) until ids.size
      (a, b) = (ids(i), ids(j))
      shared = w.keySet.filter(_._1 == a).map(_._2) &
        w.keySet.filter(_._1 == b).map(_._2)
      if shared.nonEmpty && norms(a) > 0.0 && norms(b) > 0.0
    } yield {
      val dot = shared.toSeq.sorted.foldLeft(0.0)((acc, h) =>
        acc + w((a, h)) * w((b, h)))
      (a, b, dot / (norms(a) * norms(b)))
    }
  }

  test("cosinePairsTopK is bit-equal to the plain-Scala sorted-fold reference") {
    val corpus = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val expected = reference(corpus)
      .sortBy { case (a, b, c) => (-c, a, b) }.take(100)
    val got = Tfidf.cosinePairsTopK(
        Tables.documents(spark, sf0001).select("doc_id", "text"))
      .as[(Long, Long, Double)].collect().toSeq
    Caches.releaseAll()
    assert(got == expected) // exact doubles — same folds, same order
  }

  test("exact copies score cosine 1.0 exactly; idf kills corpus-wide boilerplate") {
    // doc 3 = copy of doc 1 → identical vectors → cosine exactly 1.0.
    // docs 1 and 2 share ONLY the "common common common" shingle, which
    // appears in ALL FOUR docs → idf = ln(4/4) = 0 → their dot is exactly
    // 0 and the cosine 0.0 (boilerplate contributes nothing).
    val corpus = Seq(
      (1L, "common common common alpha beta gamma delta"),
      (2L, "common common common epsilon zeta eta theta"),
      (3L, "common common common alpha beta gamma delta"),
      (4L, "common common common iota kappa lambda mu")).toDF("doc_id", "text")
    val got = Tfidf.cosinePairsTopK(corpus, topK = 10)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    Caches.releaseAll()
    assert(got((1L, 3L)) == 1.0)
    // pairs sharing only the zero-weight boilerplate shingle score 0
    assert(got((1L, 2L)) == 0.0)
  }

  test("the df cap strips hot terms from vectors, not just from the join") {
    // "x y z" appears in every doc; with maxShingleDf = 1 every shared
    // term is stripped → no pair can score (all dots empty or zero-norm)
    val corpus = Seq(
      (1L, "x y z a b c"), (2L, "x y z d e f")).toDF("doc_id", "text")
    val got = Tfidf.cosinePairsTopK(corpus, topK = 10, maxShingleDf = 1)
      .collect()
    Caches.releaseAll()
    assert(got.isEmpty)
  }
}
