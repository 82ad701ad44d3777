package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import scala.util.Random

class SequencePackSpec extends SparkSpecBase {
  import spark.implicits._

  /** Single-threaded reference: lay (id, n) out in id order with `sep`
    * separators, cut at `L`, emit (chunk, id, begin, end) slices. */
  private def naive(
      docs: Seq[(Long, Long)], L: Long, sep: Long): Seq[(Long, Long, Long, Long)] = {
    var off = 0L
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    for ((id, n) <- docs.sortBy(_._1)) {
      if (n > 0) {
        var c = off / L
        while (c * L < off + n) {
          out += ((c, id, math.max(0L, c * L - off), math.min(n, (c + 1) * L - off)))
          c += 1
        }
      }
      off += n + sep
    }
    out.result().sortBy(t => (t._1, t._2))
  }

  private def packed(
      docs: Seq[(Long, Long)], L: Long, sep: Long, parts: Int): Seq[(Long, Long, Long, Long)] =
    Caches.scoped {
      SequencePack
        .packChunks(
          docs.toDF("doc_id", "n_tokens").repartition(parts),
          "doc_id", col("n_tokens"), seqLen = L, sepTokens = sep)
        .as[(Long, Long, Long, Long)]
        .collect()
        .toSeq
        .sortBy(t => (t._1, t._2))
    }

  test("hand-computed example: boundaries, straddles, empty doc skipped") {
    val docs = Seq((1L, 3L), (2L, 2L), (3L, 5L), (4L, 0L))
    // stream: d1 [0,3) sep@3 | d2 [4,6) sep@6 | d3 [7,12) sep@12 | d4 empty
    val expected = Seq(
      (0L, 1L, 0L, 3L), // d1 fits chunk 0
      (1L, 2L, 0L, 2L), // d2 fits chunk 1
      (1L, 3L, 0L, 1L), // d3 straddles: 1 token in chunk 1...
      (2L, 3L, 1L, 5L)) //   ...the rest in chunk 2
    assert(packed(docs, L = 4L, sep = 1L, parts = 3) == expected)
  }

  test("distributed prefix sum == single-partition reference on random corpora") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val docs = (1L to 500L).map(id => (id, rnd.nextInt(40).toLong))
      val L = Seq(8L, 16L, 64L)(trial - 1)
      assert(packed(docs, L, sep = 1L, parts = 7) == naive(docs, L, sep = 1L),
        s"trial $trial (L=$L) diverged from the reference")
    }
  }

  test("packing invariants: slices cover each doc exactly; chunks never exceed seqLen") {
    val rnd = new Random(7)
    val docs = (1L to 300L).map(id => (id, rnd.nextInt(100).toLong))
    val L = 32L
    val rows = packed(docs, L, sep = 1L, parts = 5)
    // every non-empty doc's slices are contiguous from 0 to n
    val byDoc = rows.groupBy(_._2)
    for ((id, n) <- docs if n > 0) {
      val slices = byDoc(id).sortBy(_._3)
      assert(slices.head._3 == 0L && slices.last._4 == n, s"doc $id slice span")
      slices.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 == b._3, s"doc $id slices not contiguous")
        case _         =>
      }
      // consecutive chunk ids (a doc occupies a contiguous stream span)
      assert(slices.map(_._1) == (slices.head._1 to slices.last._1))
    }
    // no chunk holds more than L doc tokens (separators account for slack)
    rows.groupBy(_._1).foreach { case (c, ss) =>
      val tokens = ss.map(s => s._4 - s._3).sum
      assert(tokens <= L, s"chunk $c overflows: $tokens > $L")
    }
    // empty docs emit nothing
    val lenOf = docs.toMap
    assert(!rows.exists(r => lenOf(r._2) == 0L))
  }

  test("sepTokens=0 packs docs back-to-back (chunk occupancy is exactly full until the tail)") {
    val docs = (1L to 50L).map(id => (id, 10L))
    val rows = packed(docs, L = 16L, sep = 0L, parts = 3)
    val total = docs.map(_._2).sum
    val full = total / 16L
    val occ = rows.groupBy(_._1).map { case (c, ss) => c -> ss.map(s => s._4 - s._3).sum }
    (0L until full).foreach(c => assert(occ(c) == 16L, s"chunk $c not full"))
    assert(occ.values.sum == total)
  }

  test("maxDocTokens fail mode: an over-cap doc stops the job loudly") {
    val docs = Seq((1L, 3L), (2L, 500L), (3L, 5L))
    val ex = intercept[IllegalArgumentException] {
      Caches.scoped {
        SequencePack.packChunks(
          docs.toDF("doc_id", "n_tokens").repartition(2),
          "doc_id", col("n_tokens"), seqLen = 4L, sepTokens = 1L,
          maxDocTokens = 100L)
      }
    }
    assert(ex.getMessage.contains("1 document(s) over maxDocTokens=100"))
    assert(Caches.trackedCount == 0, "failed pack must not leak its cache")
  }

  test("maxDocTokens drop mode: over-cap docs leave the stream as if absent") {
    val rnd = new Random(11)
    val base = (1L to 200L).filterNot(id => id == 50L || id == 120L)
      .map(id => (id, rnd.nextInt(30).toLong))
    // plant two monsters mid-stream; dropping them must shift every
    // downstream offset exactly as if they were never in the corpus
    val monsters = Seq((50L, 10000L), (120L, 9999L))
    val dirty = (base ++ monsters).sortBy(_._1)
    val got = Caches.scoped {
      SequencePack
        .packChunks(
          dirty.toDF("doc_id", "n_tokens").repartition(5),
          "doc_id", col("n_tokens"), seqLen = 16L, sepTokens = 1L,
          maxDocTokens = 100L, dropOverCap = true)
        .as[(Long, Long, Long, Long)]
        .collect().toSeq.sortBy(t => (t._1, t._2))
    }
    assert(got == naive(base, 16L, sep = 1L))
    assert(!got.exists(r => r._2 == 50L || r._2 == 120L))
  }

  test("maxDocTokens=0 (default) is unlimited — giant docs pack normally") {
    val docs = Seq((1L, 3L), (2L, 500L))
    assert(packed(docs, L = 64L, sep = 1L, parts = 2) == naive(docs, 64L, 1L))
  }

  test("operator releases its tracked cache through Caches") {
    // drain anything other suites in this shared-session JVM left behind,
    // so the before/after comparison isolates THIS operator's caches
    Caches.releaseAll(blocking = true)
    val before = spark.sparkContext.getPersistentRDDs.size
    val docs = (1L to 100L).map(id => (id, 5L))
    packed(docs, L = 16L, sep = 1L, parts = 4) // Caches.scoped inside
    assert(Caches.trackedCount == 0)
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }
}
