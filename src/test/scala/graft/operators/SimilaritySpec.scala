package graft.operators

import graft.SparkSpecBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001)
    .select("vec_id", "embedding").cache()

  private def refTopK(k: Int, queryIds: Set[Long]): Map[Long, Seq[(Long, Double)]] = {
    val local = emb.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    local.filter(q => queryIds(q._1)).map { case (qid, qv) =>
      qid -> local.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }
        .take(k).toSeq
    }.toMap
  }

  test("bruteForceTopK matches a plain-Scala exact top-k") {
    val qids = Set(0L, 1L, 2L)
    val got = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, k = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq)
      .toMap
    val ref = refTopK(4, qids).view
      .mapValues(_.map { case (id, c) =>
        (id, BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }).toMap
    assert(got.keySet == qids)
    for (q <- qids) assert(got(q) == ref(q), s"query $q")
  }

  test("sqTopK ≡ plain-Scala SQ8 replay on sf0.001; codes bounded; planted dup at rank 1") {
    val idx = Similarity.buildSqIndex(emb)
    val got = Similarity.sqTopK(emb.filter(col("vec_id") < 3), idx, k = 4)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // plain-Scala replay: exact per-dim min/max, the same
    // floor((v − mn)·255/(mx − mn)) expression, all-integer distance
    val local = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val dim = local.head._2.length
    val mins = (0 until dim).map(i => local.map(_._2(i).toDouble).min)
    val maxs = (0 until dim).map(i => local.map(_._2(i).toDouble).max)
    def codes(v: Array[Float]): Array[Long] =
      Array.tabulate(dim) { i =>
        if (maxs(i) > mins(i))
          math.min(
            math.floor((v(i).toDouble - mins(i)) * 255.0 / (maxs(i) - mins(i)))
              .toLong, 255L)
        else 0L
      }
    val coded = local.map { case (id, v) => id -> codes(v) }
    // index mins/maxs match the replay exactly (order-independent
    // selections) and every code is in [0, 255]
    assert(idx.mins == mins && idx.maxs == maxs)
    assert(coded.forall(_._2.forall(c => c >= 0L && c <= 255L)))
    val ref = coded.filter(_._1 < 3).map { case (qid, qc) =>
      qid -> coded.filter(_._1 != qid).map { case (cid, cc) =>
        (cid, qc.zip(cc).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (cid, d) => (d, cid) }.take(4).toSeq
    }.toMap
    assert(got == ref)
    idx.release()
    // a planted exact copy of query 0 quantizes identically → qdist 0,
    // and 0 beats every strictly-positive distance → rank 1
    val v0 = local.find(_._1 == 0L).get._2
    val planted = emb.unionAll(
      Seq((900000L, v0)).toDF("vec_id", "embedding"))
    val idx2 = Similarity.buildSqIndex(planted)
    val top = Similarity.sqTopK(planted.filter(col("vec_id") === 0L), idx2, k = 3)
      .as[(Long, Long, Long, Long)].collect().minBy(_._2)
    idx2.release()
    assert(top == (0L, 1L, 900000L, 0L))
  }

  test("embeddingProfile ≡ plain-Scala two-level fold; mn/mx match the SQ fit") {
    val got = Similarity.embeddingProfile(emb).orderBy("dim")
      .as[(Long, Double, Double, Double)].collect().toSeq
    val local = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val dim = local.head._2.length
    val ref = (0 until dim).map { i =>
      val vals = local.map { case (id, v) => (id, v(i).toDouble) }
      // two-level fold: sorted within vec_id%16 buckets, then by bucket
      val bs = vals.groupBy(_._1 % 16).toSeq.map { case (b, xs) =>
        (b, xs.sortBy(_._1).foldLeft(0.0)(_ + _._2))
      }
      val s = bs.sortBy(_._1).foldLeft(0.0)(_ + _._2)
      (i.toLong, vals.map(_._2).min, vals.map(_._2).max,
        s / vals.size.toDouble)
    }
    assert(got == ref)
    // the profile's mn/mx ARE what buildSqIndex fits on
    val idx = Similarity.buildSqIndex(emb)
    assert(got.map(_._2) == idx.mins && got.map(_._3) == idx.maxs)
    idx.release()
  }

  test("assignCells ≡ plain-Scala argmin-L2 with lowest-cell tie-break") {
    val local = emb.as[(Long, Array[Float])].collect()
    val cents: Seq[Seq[Double]] = local.filter(_._1 < 8).sortBy(_._1)
      .map(_._2.map(_.toDouble).toSeq).toSeq
    val got = Similarity.assignCells(emb, cents)
      .as[(Long, Int)].collect().toMap
    val ref = local.map { case (id, v) =>
      val d2 = cents.map(c => v.zip(c)
        .foldLeft(0.0) { case (s, (x, cx)) => val d = x.toDouble - cx; s + d * d })
      id -> d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }.toMap
    assert(got == ref)
    // each centroid's own vector sits in its own cell (distance 0)
    for (i <- 0 until 8) assert(got(i.toLong) == i)
  }

  test("knnClassify: majority vote, self-exclusion, deterministic min-label tie-break") {
    // 2-d toy space: two "A" (label 1) vectors hug the x-axis, one "B"
    // (label 2) sits on y; query 10 points essentially at x
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0.0f, 1.0f), 2),
      (10L, Array(1.0f, 0.05f), 2)).toDF("vec_id", "embedding", "label")
    val q = corpus.filter(col("vec_id") === 10L)
    // k=3: neighbors {1,2,3} (self excluded) → votes 1→2, 2→1 → label 1;
    // the query's OWN label (2) must not leak into the vote
    val got3 = Similarity.knnClassify(q, corpus, k = 3)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got3 == Seq((10L, 1, 2L)))
    // k=1: single nearest (vec 1, label 1)
    val got1 = Similarity.knnClassify(q, corpus, k = 1)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got1 == Seq((10L, 1, 1L)))
    // vote tie: two labels at 1 vote each → the SMALLER label wins
    val q2 = Seq((20L, Array(0.7f, 0.7f), 9)).toDF("vec_id", "embedding", "label")
    val gotTie = Similarity.knnClassify(q2,
        corpus.filter(col("vec_id") === 1L || col("vec_id") === 3L)
          .unionByName(q2), k = 2)
      .as[(Long, Int, Long)].collect().toSeq
    assert(gotTie == Seq((20L, 1, 1L)))
  }

  test("lshTopK returns ranked, deduped, correctly-scored candidates") {
    val out = Similarity.lshTopK(emb.filter(col("vec_id") < 3), emb, k = 4,
      nBits = 16, bands = 8).collect()
    // ranks are 1..n per query, no self-pairs, scores within [-1,1]
    val byQ = out.groupBy(_.getLong(0))
    for ((_, rows) <- byQ) {
      val ranks = rows.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to ranks.size))
      assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
      assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0))
    }
  }

  test("multi-probe LSH: candidate pool is a superset — recall never drops, scores stay exact") {
    // hammingProbes=1 probes every band bucket at Hamming distance <= 1, so
    // every exact-bucket meeting still happens: per query, the multi-probe
    // result's recall vs brute force must be >= the exact-bucket result's.
    // Scores remain exact cosines (probing changes WHICH pairs are scored,
    // never HOW), so any (query, neighbor) present in both carries the
    // same cos_sim.
    val q = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(q, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def pairsAndScores(hp: Int) = {
      val rows = Similarity.lshTopK(q, emb, k = 5, nBits = 16, bands = 4,
        hammingProbes = hp).collect()
      (rows.map(r => (r.getLong(0), r.getLong(2))).toSet,
        rows.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap)
    }
    val (exactPairs, exactScores) = pairsAndScores(0)
    val (mpPairs, mpScores) = pairsAndScores(1)
    assert((mpPairs & truth).size >= (exactPairs & truth).size,
      s"multi-probe recall dropped: ${(mpPairs & truth).size} < ${(exactPairs & truth).size}")
    for (p <- exactPairs & mpPairs)
      assert(exactScores(p) == mpScores(p), s"score changed for $p")
    // and the planted-copy guarantee is unchanged: a duplicate vector's
    // bucket is its own bucket under any probe radius
    val self = emb.filter(col("vec_id") === 1)
      .select((col("vec_id") + 7000L).as("vec_id"), col("embedding"))
    val out = Similarity.lshTopK(self, emb, k = 1, nBits = 16, bands = 8,
      hammingProbes = 1).collect()
    assert(out.head.getLong(2) == 1L && out.head.getDouble(3) == 1.0)
  }

  test("zero-norm embeddings in the corpus are skipped, not a crash") {
    val zero = Seq((9999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val corpus = emb.unionAll(zero)
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 2), corpus, k = 3)
      .collect()
    assert(out.length == 6) // 2 queries × 3 ranked neighbors, zero vector absent
    assert(!out.exists(_.getLong(2) == 9999L))
  }

  test("ivfTopK: planted identical vector at rank 1; high recall vs brute force") {
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(q, emb, k = 3, nCells = 8, nProbe = 4).collect()
    val byQ = ivf.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((_, rows) <- byQ)
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length))
    // self-copy query: its own cell is probed first → rank 1, cosine 1
    val self = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val out = Similarity.ivfTopK(self, emb, k = 3, nCells = 8, nProbe = 1).collect()
    val rank1 = out.find(_.getLong(1) == 1L).get
    assert(rank1.getLong(2) == 0L && rank1.getDouble(3) == 1.0)
    // probing every cell must reproduce brute force exactly
    val full = Similarity.ivfTopK(q, emb, k = 3, nCells = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bf = Similarity.bruteForceTopK(q, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == bf)
  }

  test("pqTopK: shortlist ≥ corpus ≡ brute force exactly; planted duplicate recalled") {
    val q = emb.filter(col("vec_id") < 5)
    val idx = Similarity.buildPqIndex(emb, m = 8, ksub = 16)
    try {
      // exact point: the full-corpus shortlist degenerates to brute force
      val full = Similarity.pqTopK(q, idx, emb, k = 3, shortlist = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val bf = Similarity.bruteForceTopK(q, emb, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(full == bf)
      // planted exact duplicate: identical vector → identical codes → ADC
      // score ties the best possible → survives any shortlist ≥ k; exact
      // rescore then pins it at rank 1 / cosine 1
      val self = emb.filter(col("vec_id") === 0)
        .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
      val out = Similarity.pqTopK(self, idx, emb, k = 3, shortlist = 10).collect()
      val rank1 = out.find(_.getLong(1) == 1L).get
      assert(rank1.getLong(2) == 0L && rank1.getDouble(3) == 1.0)
      // operating-point recall@3 vs brute force on the real corpus
      val opPoint = Similarity.pqTopK(q, idx, emb, k = 3, shortlist = 30)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val bfPairs = bf.map(t => (t._1, t._3))
      val recall = bfPairs.count(opPoint.contains).toDouble / bfPairs.size
      assert(recall >= 0.5, s"pq recall@3 too low: $recall")
    } finally idx.release(blocking = true)
  }

  test("ivfPqTopK: exact point ≡ brute force; planted duplicate at rank 1 at the operating point") {
    val idx = Similarity.buildIvfPqIndex(emb, nCells = 8, m = 8, ksub = 16)
    try {
      // exact point: every cell probed + corpus-sized shortlist ⇒ ≡ brute force
      val exact = Similarity.ivfPqTopK(emb.filter(col("vec_id") < 3), idx, emb,
          k = 4, nProbe = 8, shortlist = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      assert(exact == brute)
      // operating point: a corpus vector queried against the index finds its
      // planted identical twin (vec 0's own cell is its first probe — the
      // NearestCells self-probe law — and ADC ranks the identical codes first)
      val dup = emb.filter(col("vec_id") === 0)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
      val idx2 = Similarity.buildIvfPqIndex(emb.unionAll(dup), nCells = 8, m = 8, ksub = 16)
      try {
        val got = Similarity.ivfPqTopK(emb.filter(col("vec_id") === 0), idx2,
            emb.unionAll(dup), k = 3, nProbe = 2, shortlist = 10)
          .filter(col("rank") === 1).collect().head
        assert(got.getLong(2) == 10000L && got.getDouble(3) == 1.0)
      } finally idx2.release()
    } finally idx.release()
  }

  test("ivfPqResTopK: exact point ≡ brute force; planted duplicate at rank 1; shifted-codebook encode matches the driver-side residual twin") {
    val idx = Similarity.buildIvfPqResIndex(emb, nCells = 8, m = 8, ksub = 16)
    try {
      // exact point: every cell probed + corpus-sized shortlist ⇒ ≡ brute
      // force (the rescore is exact cosine over everything; the residual
      // codebook shift cannot change that)
      val exact = Similarity.ivfPqResTopK(emb.filter(col("vec_id") < 3), idx, emb,
          k = 4, nProbe = 8, shortlist = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      assert(exact == brute)

      // the CASE-dispatched NearestCells encode over shifted codebooks must
      // equal the plain-Scala residual twin: cell = argmin ‖v − centroid‖²
      // (lowest-index ties), code_mi = argmin_j ‖v|sub − shiftedCb(cell)(mi)(j)‖²
      // — same left-to-right Σ(x−c)² fold, float widened to double
      val sub = idx.cellCodebooks.head.head.head.size
      val m = idx.cellCodebooks.head.size
      def argmin(v: Array[Double], cands: Seq[Seq[Double]]): Int = {
        var best = 0; var bestD = Double.MaxValue
        for (c <- cands.indices) {
          var s = 0.0
          for (j <- v.indices) { val d = v(j) - cands(c)(j); s += d * d }
          if (s < bestD) { best = c; bestD = s }
        }
        best
      }
      val got = idx.encoded.orderBy("neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toVector))
      val raw = emb.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      assert(got.length == raw.length)
      got.zip(raw).foreach { case ((gid, gCell, gCodes), (rid, v)) =>
        assert(gid == rid)
        val cell = argmin(v, idx.centroids)
        assert(gCell == cell, s"cell mismatch for vec $gid")
        val codes = (0 until m).map { mi =>
          argmin(java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub),
            idx.cellCodebooks(cell)(mi))
        }.toVector
        assert(gCodes == codes, s"codes mismatch for vec $gid")
      }

      // operating point: a corpus vector queried against the index finds its
      // planted identical twin (self-probe law + identical codes tie best)
      val dup = emb.filter(col("vec_id") === 0)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
      val idx2 = Similarity.buildIvfPqResIndex(emb.unionAll(dup), nCells = 8, m = 8, ksub = 16)
      try {
        val got2 = Similarity.ivfPqResTopK(emb.filter(col("vec_id") === 0), idx2,
            emb.unionAll(dup), k = 3, nProbe = 2, shortlist = 10)
          .filter(col("rank") === 1).collect().head
        assert(got2.getLong(2) == 10000L && got2.getDouble(3) == 1.0)
      } finally idx2.release()
    } finally idx.release()
  }

  test("buildPqIndex: codes cover all subspaces; release drops the index cache") {
    val idx = Similarity.buildPqIndex(emb, m = 4, ksub = 8)
    val codes = idx.encoded.select("codes").collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val a = r.getSeq[Int](0)
      assert(a.size == 4 && a.forall(c => c >= 0 && c < 8))
    }
    val before = Caches.trackedIndexCount
    idx.release(blocking = true)
    assert(Caches.trackedIndexCount == before - 1)
  }

  test("lshTopK puts a planted identical vector at rank 1 with cosine 1") {
    val q = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val out = Similarity.lshTopK(q, emb, k = 3, nBits = 16, bands = 8).collect()
    val rank1 = out.find(_.getLong(1) == 1L).get
    assert(rank1.getLong(2) == 0L)
    assert(rank1.getDouble(3) == 1.0)
  }

  test("appendToIvfIndex: save/append/load ≡ full rebuild at nProbe = nCells; appended self-probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    try {
      // base corpus = even ids, ingest batch = odd ids — the daily-append
      // shape: the quantizer is fitted ONLY on the base, the batch is
      // assigned to existing centroids without a refit
      val base = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val batch = emb.filter(pmod(col("vec_id"), lit(2)) =!= 0)
      val built = Similarity.buildIvfIndex(base, nCells = 8)
      val appended = Similarity.appendToIvfIndex(built, batch)
      Similarity.saveIvfIndex(appended, dir)
      val loaded = Similarity.loadIvfIndex(spark, dir)
      val q = emb.filter(col("vec_id") < 5)
      def probe(ix: Similarity.IvfIndex) =
        Similarity.ivfTopK(q, ix, k = 3, nProbe = 8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      // at nProbe = nCells every cell is probed, so BOTH the appended index
      // and a from-scratch rebuild over the union are ≡ brute force on the
      // union corpus — cell assignment differences cannot matter
      val rebuilt = Similarity.buildIvfIndex(emb, nCells = 8)
      assert(probe(appended) == probe(rebuilt))
      assert(probe(loaded) == probe(appended))
      // self-probe guarantee extends to APPENDED vectors: a copy of an
      // odd-id (batch) vector probing one cell lands on its duplicate —
      // append uses the same NearestCells expression as build and probe
      val selfQ = emb.filter(col("vec_id") === 1)
        .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
      val out = Similarity.ivfTopK(selfQ, appended, k = 1, nProbe = 1).collect()
      assert(out.head.getLong(2) == 1L && out.head.getDouble(3) == 1.0)
      built.release()
      appended.release()
      loaded.release()
      rebuilt.release()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("appendToIvfIndex: checkpointEvery truncates lineage without changing results; counter resets") {
    val base = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val built = Similarity.buildIvfIndex(base, nCells = 8)
    // three appends at checkpointEvery = 2: generations go appends 1 →
    // 0 (checkpoint) → 1, and the checkpointed generation's plan is an
    // RDD leaf, not an N-deep unionAll chain
    def batch(shift: Long) = emb.filter(pmod(col("vec_id"), lit(2)) =!= 0)
      .select((col("vec_id") + lit(shift)).as("vec_id"), col("embedding"))
    val a1 = Similarity.appendToIvfIndex(built, batch(10000), checkpointEvery = 2)
    val a2 = Similarity.appendToIvfIndex(a1, batch(20000), checkpointEvery = 2)
    val a3 = Similarity.appendToIvfIndex(a2, batch(30000), checkpointEvery = 2)
    assert(a1.appends == 1 && a2.appends == 0 && a3.appends == 1)
    // the checkpointed generation reads an RDD leaf — lineage is truncated
    import org.apache.spark.sql.graftbridge.DatasetBridge
    assert(DatasetBridge.checkpointBackingRdds(a2.assigned).nonEmpty,
      "generation 2 should be localCheckpoint-backed")
    assert(DatasetBridge.checkpointBackingRdds(a1.assigned).isEmpty)
    // results through the checkpointed chain ≡ a from-scratch rebuild over
    // the same union at nProbe = nCells (both are brute force there)
    val union = base.unionAll(batch(10000)).unionAll(batch(20000)).unionAll(batch(30000))
    val rebuilt = Similarity.buildIvfIndex(union, nCells = 8)
    val q = emb.filter(col("vec_id") < 5)
    def probe(ix: Similarity.IvfIndex) =
      Similarity.ivfTopK(q, ix, k = 3, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(probe(a3) == probe(rebuilt))
    val backingIds = DatasetBridge.checkpointBackingRdds(a2.assigned).map(_.id).toSet
    assert(backingIds.nonEmpty)
    Seq(built, a1, a2, a3, rebuilt).foreach(_.release(blocking = true))
    // the suite-level emb cache stays; the checkpoint backing blocks must go
    val left = spark.sparkContext.getPersistentRDDs.keySet
    assert(backingIds.forall(id => !left.contains(id)),
      "release() must also drop the localCheckpoint backing blocks")
  }

  test("ivfCellOccupancy / ivfImbalance: counts sum to corpus; skewed append raises the ratio") {
    val built = Similarity.buildIvfIndex(emb, nCells = 8)
    val occ = Similarity.ivfCellOccupancy(built).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(occ.values.sum == emb.count(), "every vector lands in exactly one cell")
    assert(occ.keys.forall(c => c >= 0 && c < 8))
    val balanced = Similarity.ivfImbalance(built)
    assert(balanced >= 1.0)
    // drift: append 2×|corpus| copies of vector 0's embedding — identical
    // embeddings share a nearest centroid, so ALL land in one cell. That
    // cell then holds ≥ 2Σ rows while the median cell holds ≤ Σ (no other
    // cell grew), so the ratio is ≥ 2 by construction — a bound that holds
    // for ANY base distribution, not just a well-balanced quantizer fit.
    val n = emb.count()
    val v0 = emb.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    val clones = emb.select((col("vec_id") + lit(100000L)).as("vec_id"))
      .unionAll(emb.select((col("vec_id") + lit(200000L)).as("vec_id")))
      .crossJoin(v0).select(col("vec_id"), col("e0").as("embedding"))
    val drifted = Similarity.appendToIvfIndex(built, clones)
    val occ2 = Similarity.ivfCellOccupancy(drifted).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(occ2.values.sum == 3 * n, "append must add exactly the batch rows")
    assert(occ2.values.max >= 2 * n, "all clones must land in one cell")
    assert(Similarity.ivfImbalance(drifted) >= 2.0,
      "a one-cell 2Σ append must push max/median to ≥ 2")
    built.release(); drifted.release()
  }

  test("IvfIndex save/load round-trip: probe results identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    try {
      val built = Similarity.buildIvfIndex(emb, nCells = 8)
      Similarity.saveIvfIndex(built, dir)
      val loaded = Similarity.loadIvfIndex(spark, dir)
      assert(loaded.centroids == built.centroids) // exact doubles — parquet round-trip
      val q = emb.filter(col("vec_id") < 5)
      def probe(ix: Similarity.IvfIndex) =
        Similarity.ivfTopK(q, ix, k = 3, nProbe = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      assert(probe(loaded) == probe(built))
      built.release()
      loaded.release()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  /** Plain-Scala replay of [[Similarity.semanticDedup]]'s EXACT semantics
    * (assignment fold, pair cosines, union-find components, the
    * keep-least-prototypical (ccos, vec_id) keeper order) on the real
    * sf0.001 corpus. Every double is computed with the same op order the
    * native expressions use (left-to-right index fold, per-element
    * float→double widening), so the comparison is exact — the same
    * bit-equality bar the DuckDB oracle holds the query to. */
  test("semanticDedup ≡ plain-Scala SemDeDup replay on sf0.001") {
    val local = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val cents: Seq[Seq[Double]] = local.filter(_._1 < 8)
      .map(_._2.map(_.toDouble).toSeq).toSeq
    def cos(a: Array[Float], c: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nc = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * c(i); na += a(i).toDouble * a(i).toDouble
        nc += c(i) * c(i)
      }
      d / (math.sqrt(na) * math.sqrt(nc))
    }
    val cell = local.map { case (id, v) =>
      val d2 = cents.map(c => v.indices
        .foldLeft(0.0) { (s, i) => val d = v(i).toDouble - c(i); s + d * d })
      id -> d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }.toMap
    val pairs = for {
      (a, va) <- local; (b, vb) <- local
      if a < b && cell(a) == cell(b) &&
        cos(va, vb.map(_.toDouble).toSeq) >= 0.4
    } yield (a, b)
    assert(pairs.nonEmpty, "fixture must have within-cell near-dups")
    // union-find → min-reachable-id component labels
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byId = local.toMap
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val groups = members.groupBy(find)
    val expected = groups.values.flatMap { ms =>
      val keeper = ms.minBy { m => (cos(byId(m), cents(cell(m))), m) }
      ms.filter(_ != keeper).map(m => (m, keeper))
    }.toSet
    val got = Similarity.semanticDedup(emb, cents, threshold = 0.4,
        loopParts = 1)
      .as[(Long, Long)].collect().toSet
    graft.operators.Caches.releaseAll()
    assert(got == expected)
    // laws: a keeper is never dropped; drops are unique
    val (dropped, kept) = (got.map(_._1), got.map(_._2))
    assert(dropped.intersect(kept).isEmpty)
    assert(got.toSeq.map(_._1).distinct.size == got.size)
  }

  test("lloydTrain: hand-computed 2-round trajectory, exact fold means") {
    val corpus = Seq(
      (0L, Array(0.0f)), (1L, Array(10.0f)), (2L, Array(1.0f)),
      (3L, Array(2.0f)), (4L, Array(9.0f)), (5L, Array(8.0f)),
      (6L, Array(4.9f))
    ).toDF("vec_id", "embedding")
    val seeds = Seq(Seq(0.0), Seq(10.0))
    // round 1: cell0 = {0,2,3,6}, cell1 = {1,4,5}; two-level fold means
    // (singleton buckets, bucket-ordered): 4.9f widens to its double value
    val v49 = Array(4.9f)(0).toDouble
    val m0 = (((0.0 + 0.0) + 1.0) + 2.0 + v49) / 4.0
    val m1 = ((0.0 + 10.0) + 9.0 + 8.0) / 3.0
    val c1 = Similarity.lloydCentroids(corpus, seeds)
    assert(c1 == Seq(Seq(m0), Seq(m1)))
    // round 2: assignment unchanged (4.9 still nearer m0) → same means
    assert(Similarity.lloydCentroids(corpus, c1) == Seq(Seq(m0), Seq(m1)))
    val got = Similarity.lloydTrain(corpus, seeds, rounds = 2)
      .as[(Long, Int)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L, 0), (1L, 1), (2L, 0), (3L, 0), (4L, 1),
      (5L, 1), (6L, 0)))
  }

  test("sseUnder: hand fold; Lloyd rounds never increase the objective") {
    val corpus = Seq(
      (0L, Array(0.0f)), (1L, Array(10.0f)), (2L, Array(1.0f)),
      (3L, Array(2.0f)), (4L, Array(9.0f)), (5L, Array(8.0f)),
      (6L, Array(4.9f))
    ).toDF("vec_id", "embedding")
    val seeds = Seq(Seq(0.0), Seq(10.0))
    def sse(c: Seq[Seq[Double]]): Double =
      Similarity.sseUnder(corpus, c).as[Double].collect().head
    // hand fold under the seeds (singleton buckets → bucket-ordered sum
    // of per-vector min squared distances, 4.9f widened)
    val v49 = Array(4.9f)(0).toDouble
    val mins = Seq(0.0, 0.0, 1.0, 4.0, 1.0, 4.0,
      math.min(v49 * v49, (v49 - 10.0) * (v49 - 10.0)))
    var want = 0.0
    mins.foreach(d => want = want + d)
    assert(java.lang.Double.doubleToLongBits(sse(seeds)) ==
      java.lang.Double.doubleToLongBits(want))
    val c1 = Similarity.lloydCentroids(corpus, seeds)
    val c2 = Similarity.lloydCentroids(corpus, c1)
    assert(sse(c1) <= sse(seeds) && sse(c2) <= sse(c1))
  }

  test("lloydCentroids: an empty cell keeps its previous centroid") {
    val corpus = Seq((10L, Array(0.0f)), (11L, Array(1.0f)))
      .toDF("vec_id", "embedding")
    val c1 = Similarity.lloydCentroids(corpus, Seq(Seq(0.5), Seq(100.0)))
    assert(c1 == Seq(Seq(0.5), Seq(100.0)))
  }
}
