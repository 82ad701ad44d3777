package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions.col

class ClassifySpec extends SparkSpecBase {
  import spark.implicits._

  // (doc_id, label, text); even ids train, odd ids test
  private val corpus = Seq(
    (2L, "spam", "buy pills buy now cheap"),
    (4L, "spam", "cheap pills now buy"),
    (6L, "ham", "meeting notes agenda today"),
    (8L, "ham", "agenda for meeting notes"),
    (10L, "ham", "notes for today meeting"),
    (1L, "spam", "buy cheap pills"),       // spam-vocab test doc
    (3L, "ham", "meeting agenda notes"),   // ham-vocab test doc
    (5L, "ham", "zzz qqq www"),            // all-OOV → prior-only
    (7L, "spam", "buy meeting")            // mixed
  )

  /** Plain-Scala replay: same counts, same smoothing, same token-ordered
    * fold shape (prior + fold-from-zero), same (−score, label) argmax. */
  private def refScores(): Map[Long, Seq[(String, Double)]] = {
    val train = corpus.filter(_._1 % 2 == 0)
    val test = corpus.filter(_._1 % 2 != 0)
    def toks(t: String): Map[String, Long] =
      t.trim.split("\\s+").toSeq.groupBy(identity)
        .map { case (w, v) => w -> v.size.toLong }
    val ndc = train.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val n = train.size.toLong
    val tc = train.flatMap(d => toks(d._3).map { case (w, k) => (d._2, w, k) })
      .groupBy(x => (x._1, x._2)).map { case (k, v) => k -> v.map(_._3).sum }
    val ncl = tc.groupBy(_._1._1).map { case (l, v) => l -> v.values.sum }
    val vocab = tc.keySet.map(_._2)
    val v = vocab.size.toLong
    test.map { d =>
      d._1 -> ndc.keys.toSeq.sorted.map { c =>
        var acc = 0.0
        toks(d._3).filter(t => vocab.contains(t._1)).toSeq.sortBy(_._1)
          .foreach { case (w, k) =>
            acc = acc + k.toDouble *
              math.log((tc.getOrElse((c, w), 0L) + 1L).toDouble / (ncl(c) + v).toDouble)
          }
        c -> (math.log(ndc(c).toDouble / n.toDouble) + acc)
      }
    }.toMap
  }

  test("multinomialNb: predictions + scores bit-equal to the replay") {
    val docs = corpus.toDF("doc_id", "label", "text")
    val got = Caches.scoped {
      Classify.multinomialNb(docs, "label", col("doc_id") % 2 === 0)
        .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    }
    val ref = refScores()
    assert(got.map(_._1) == Seq(1L, 3L, 5L, 7L))
    got.foreach { case (id, pred, score) =>
      val want = ref(id).minBy { case (c, s) => (-s, c) }
      assert(pred == want._1, s"doc $id pred")
      assert(java.lang.Double.doubleToLongBits(score) ==
        java.lang.Double.doubleToLongBits(want._2), s"doc $id score")
    }
    // the vocab-separable docs classify correctly
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(1L) == "spam" && byId(3L) == "ham")
  }

  test("multinomialNb: all-OOV doc falls back to the prior argmax") {
    val docs = corpus.toDF("doc_id", "label", "text")
    val got = Caches.scoped {
      Classify.multinomialNb(docs, "label", col("doc_id") % 2 === 0)
        .as[(Long, String, Double)].collect().toSeq
    }
    val oov = got.find(_._1 == 5L).get
    // priors: ham 3/5, spam 2/5 → ham; score = ln(3/5) exactly
    assert(oov._2 == "ham")
    assert(java.lang.Double.doubleToLongBits(oov._3) ==
      java.lang.Double.doubleToLongBits(math.log(3.0 / 5.0)))
  }
}
