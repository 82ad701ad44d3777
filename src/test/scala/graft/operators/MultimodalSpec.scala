package graft.operators

import graft.SparkSpecBase

/** Session-lifecycle probe: counts opens/decodes/closes across tasks
  * (local-mode tasks share the JVM, so statics see every partition). */
object CountingCodec {
  val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  val decoded = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opened.set(0); closed.set(0); decoded.set(0) }
}

class CountingCodec extends Multimodal.MediaCodec {
  def open(): Multimodal.MediaCodec.Session = {
    CountingCodec.opened.incrementAndGet()
    new Multimodal.MediaCodec.Session {
      def decode(kind: String, payload: Array[Byte]): Multimodal.MediaCodec.Decoded = {
        CountingCodec.decoded.incrementAndGet()
        Multimodal.MediaCodec.Decoded(0, 0, 0, 1, Array(payload.length.toFloat))
      }
      def close(): Unit = CountingCodec.closed.incrementAndGet()
    }
  }
}

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._
  import Multimodal._

  private val rows = Seq(
    MediaRow(1L, "image", Array[Byte](1, 2, 3, 4), 2, 2, 0),
    MediaRow(2L, "audio", Array[Byte](9, 8, 7), 0, 0, 16000),
    MediaRow(3L, "image", Array.emptyByteArray, 0, 0, 0))

  test("decodeFake: deterministic per-partition batch decode, stable features") {
    val ds = rows.toDS().repartition(2)
    val a = decodeFake(ds, dim = 4).collect().sortBy(_.media_id)
    val b = decodeFake(ds, dim = 4).collect().sortBy(_.media_id)
    assert(a.map(_.checksum).toSeq == b.map(_.checksum).toSeq) // deterministic
    assert(a.forall(_.features.length == 4))
    assert(a.map(_.n_bytes).toSeq == Seq(4L, 3L, 0L))
    assert(a.forall(_.features.forall(f => f >= 0.0f && f <= 1.0f)))
    // checksum actually depends on payload bytes
    assert(a(0).checksum != a(1).checksum)
  }

  test("decodeWith(FakeMediaCodec) matches decodeFake's math through the codec contract") {
    val ds = rows.toDS().repartition(2)
    val viaContract = decodeWith(ds, new FakeMediaCodec(dim = 4))
      .collect().sortBy(_.media_id)
    val direct = decodeFake(ds, dim = 4).collect().sortBy(_.media_id)
    // identical feature math and provenance — swapping in a real codec is
    // exactly one MediaCodec implementation, plumbing already certified
    assert(viaContract.map(_.features.toSeq).toSeq == direct.map(_.features.toSeq).toSeq)
    assert(viaContract.map(_.n_bytes).toSeq == direct.map(_.n_bytes).toSeq)
    assert(viaContract.map(_.kind).toSeq == direct.map(_.kind).toSeq)
    // output schema shape: fixed-width float features, metadata ints
    assert(viaContract.forall(_.features.length == 4))
  }

  test("decodeWith opens ONE codec session per partition and closes every one") {
    val nParts = 3
    val ds = (1L to 12L).map(i =>
      MediaRow(i, "image", Array[Byte](i.toByte), 1, 1, 0)).toDS().repartition(nParts)
    CountingCodec.reset()
    val out = decodeWith(ds, new CountingCodec).collect()
    assert(out.length == 12)
    assert(CountingCodec.opened.get() == nParts,
      s"expected $nParts opens, got ${CountingCodec.opened.get()}")
    assert(CountingCodec.closed.get() == nParts,
      s"expected $nParts closes, got ${CountingCodec.closed.get()}")
    assert(CountingCodec.decoded.get() == 12)
  }

  test("resizeFake shrinks payload with the pixel ratio, updates dims") {
    val img = MediaRow(7L, "image", Array.tabulate(100)(_.toByte), 10, 10, 0)
    val out = resizeFake(Seq(img).toDS(), outW = 5, outH = 5).collect()(0)
    assert(out.width == 5 && out.height == 5)
    assert(out.payload.length == 25) // 100 bytes × (25/100 pixels)
    assert(out.payload.toSeq == img.payload.take(25).toSeq) // deterministic
  }

  test("frameSampleFake emits every stride-th chunk as a frame row") {
    val vid = MediaRow(8L, "video", Array.tabulate(40)(_.toByte), 0, 0, 0)
    val out = frameSampleFake(Seq(vid).toDS(), frameCount = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
    assert(out.map(x => (x._1, x._2)).toSeq == Seq((8L, 0), (8L, 2)))
    assert(out(0)._3 == (0 until 10).map(_.toByte).toSeq)
    assert(out(1)._3 == (20 until 30).map(_.toByte).toSeq)
  }

  test("payloadStats computes byte length + header hex columnar-only") {
    val df = rows.toDS().toDF()
    val got = payloadStats(df).select("media_id", "n_bytes", "header_hex")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 4L, "01020304"), (2L, 3L, "090807"), (3L, 0L, "")))
  }

  test("BlockhashBands expression is bit-equal to its plain-Scala reference") {
    import graft.expressions.BlockhashBands
    import org.apache.spark.sql.functions.col
    // deterministic pseudo-random payloads of awkward lengths: shorter
    // than the block count, exact multiples, long, empty — plus negative
    // bytes (the & 0xff unsigned fold is part of the contract)
    val rnd = new scala.util.Random(42)
    val payloads: Seq[Array[Byte]] =
      Seq(0, 1, 7, 63, 64, 65, 300, 4096).map { n =>
        val a = new Array[Byte](n); rnd.nextBytes(a); a
      }
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("media_id", "payload")
    val got = df.select(col("media_id"),
        graft.functions.VectorFunctions.blockhashBands(col("payload"), 64, 16)
          .as("bh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(got(i.toLong) == BlockhashBands.reference(p, 64, 16).toSeq,
        s"payload #$i (${p.length} bytes)")
    }
    // empty payload → all-zero bands (pairs with other empties at hamming 0)
    assert(got(0L) == Seq(0L, 0L, 0L, 0L))
    // band values stay inside 16 bits — the no-sign-bit contract
    assert(got.values.forall(_.forall(v => v >= 0L && v < (1L << 16))))
  }

  test("phashPairs: planted near-identical payloads pair, disparate ones do not") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val base = new Array[Byte](1024); rnd.nextBytes(base)
    // near-dup: flip a handful of bytes (a few block sums wiggle, most
    // bits survive); far: an independent payload
    val near = base.clone(); (0 until 8).foreach(i => near(i * 100) = (near(i * 100) + 1).toByte)
    val far = new Array[Byte](1024); rnd.nextBytes(far)
    val media = Seq((1L, base), (2L, near), (3L, far), (4L, base.clone()))
      .toDF("media_id", "payload")
    val pairs = Dedup.phashPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.releaseAll()
    assert(pairs.contains((1L, 4L)), "exact copy must pair at hamming 0")
    assert(pairs.contains((1L, 2L)), "lightly-perturbed payload must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "independent payload must not pair")
    // pair set equals the all-pairs hamming<=3 truth from the reference
    import graft.expressions.BlockhashBands
    val sigs = Seq(1L -> base, 2L -> near, 3L -> far, 4L -> base)
      .map { case (id, p) => id -> BlockhashBands.reference(p, 64, 16) }
    val truth = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = sa.zip(sb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (ia, ib)).toSet
    assert(pairs == truth)
  }
}
