package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.sources.Tables

/**
 * Locks in the deterministic cache-release contract: after an operator's
 * output is materialized and `Caches.releaseAll()` runs, NOTHING remains
 * persisted in the whole SparkContext — no CacheManager entry, no loop RDD.
 * A new persist that bypasses [[Caches.persistTracked]] (or an RDD persist
 * without its try/finally release) fails here before it can re-introduce
 * the round-5/6 bench variance.
 */
class PersistHygieneSpec extends SparkSpecBase {

  private def assertAllReleased(label: String): Unit = {
    Caches.releaseAll(blocking = true)
    assert(Caches.trackedCount == 0, s"$label: Caches still tracking entries")
    val leftover = spark.sparkContext.getPersistentRDDs
    assert(leftover.isEmpty,
      s"$label left ${leftover.size} persisted RDD(s): " +
        leftover.values.map(_.name).mkString(", "))
  }

  private def docs = Tables.documents(spark, sf0001).select("doc_id", "text")

  // Start each test from a clean slate so a previous suite's leftovers
  // (shared session) can't blame the operator under test.
  private def clean(): Unit = {
    Caches.releaseAll(blocking = true)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  test("exactByFingerprint releases everything after releaseAll") {
    clean()
    Dedup.exactByFingerprint(docs).write.format("noop").mode("overwrite").save()
    assertAllReleased("exactByFingerprint")
  }

  test("minhashLsh releases everything after releaseAll") {
    clean()
    Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save()
    assertAllReleased("minhashLsh")
  }

  test("simhashPairs releases everything after releaseAll") {
    clean()
    Dedup.simhashPairs(docs, bands = 16, maxHamming = 12)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("simhashPairs")
  }

  test("ngramJaccard (both engines) releases everything after releaseAll") {
    clean()
    Dedup.ngramJaccard(docs, prefixFilter = true)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("ngramJaccard prefix")
    Dedup.ngramJaccard(docs, prefixFilter = false)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("ngramJaccard naive")
  }

  test("minhashNgramJaccard releases everything after releaseAll") {
    clean()
    Dedup.minhashNgramJaccard(docs).write.format("noop").mode("overwrite").save()
    assertAllReleased("minhashNgramJaccard")
  }

  test("Decontaminate.overlapStats releases everything after releaseAll") {
    clean()
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val d = docs
    Decontaminate.overlapStats(
        d.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(7)) === 0))
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("Decontaminate.overlapStats")
  }

  test("corpusDupSpans releases everything after releaseAll") {
    clean()
    TextProfile.corpusDupSpans(docs, k = 3)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("corpusDupSpans")
  }

  test("unigramSurprisal releases everything after releaseAll") {
    clean()
    TextProfile.unigramSurprisal(docs)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("unigramSurprisal")
  }

  test("embeddingNearDupLsh releases everything after releaseAll") {
    clean()
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    Dedup.embeddingNearDupLsh(emb, threshold = 0.9)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("embeddingNearDupLsh")
  }

  test("duplicateClusters leaves ONLY its tracked result cache; loop RDDs are gone") {
    clean()
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(pairs)
    // the loop's RDD persists (input pairs, edges, labels) are released by
    // the operator itself; what remains is exactly the one tracked result
    assert(Caches.trackedCount == 1,
      s"expected only the result cache tracked, got ${Caches.trackedCount}")
    // the result must be readable AFTER the loop RDDs are gone (i.e. it was
    // materialized, not a lazy plan over released lineage)
    assert(clusters.count() == 5)
    assertAllReleased("duplicateClusters")
  }

  test("IVF lifecycle (build → save → load → append → checkpoint-append → release) leaks nothing") {
    clean()
    Caches.releaseAllIndexes(blocking = true)
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-hygiene").toString
    try {
      val built = Similarity.buildIvfIndex(emb, nCells = 4)
      Similarity.saveIvfIndex(built, dir)
      val loaded = Similarity.loadIvfIndex(spark, dir)
      def batch(shift: Long) =
        emb.select((col("vec_id") + lit(shift)).as("vec_id"), col("embedding"))
      // checkpointEvery = 2 exercises BOTH append paths: a1 persists the
      // union, a2 takes the localCheckpoint lineage-truncation path (whose
      // backing RDD Dataset.unpersist alone cannot release)
      val a1 = Similarity.appendToIvfIndex(loaded, batch(10000), checkpointEvery = 2)
      val a2 = Similarity.appendToIvfIndex(a1, batch(20000), checkpointEvery = 2)
      a2.assigned.write.format("noop").mode("overwrite").save()
      // every IVF cache is INDEX-tracked: the per-query registry stays
      // empty (an index must survive per-query releaseAll drains) …
      assert(Caches.trackedCount == 0,
        "IVF caches must not land in the per-query registry")
      assert(Caches.trackedIndexCount == 4,
        s"built/loaded/a1/a2 should be index-tracked, got ${Caches.trackedIndexCount}")
      // … and a releaseAll() between query batches must NOT evict an index
      Caches.releaseAll(blocking = true)
      assert(Caches.trackedIndexCount == 4)
      Seq(built, loaded, a1, a2).foreach(_.release(blocking = true))
      assert(Caches.trackedIndexCount == 0)
      assertAllReleased("IVF lifecycle")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("PQ lifecycle (build → query → release) leaks nothing; index survives releaseAll") {
    clean()
    Caches.releaseAllIndexes(blocking = true)
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val idx = Similarity.buildPqIndex(emb, m = 4, ksub = 8)
    Similarity.pqTopK(emb.filter(col("vec_id") < 3), idx, emb, k = 3,
        shortlist = 10)
      .write.format("noop").mode("overwrite").save()
    assert(Caches.trackedCount == 0,
      "PQ caches must not land in the per-query registry")
    assert(Caches.trackedIndexCount == 1, "encoded corpus should be index-tracked")
    Caches.releaseAll(blocking = true)
    assert(Caches.trackedIndexCount == 1, "releaseAll must not evict the PQ index")
    idx.release(blocking = true)
    assert(Caches.trackedIndexCount == 0)
    assertAllReleased("PQ lifecycle")
  }

  test("Caches.scoped releases on success AND on failure") {
    clean()
    Caches.scoped {
      Dedup.minhashLsh(docs).write.format("noop").mode("overwrite").save()
    }
    assert(Caches.trackedCount == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    intercept[RuntimeException] {
      Caches.scoped {
        Dedup.minhashLsh(docs) // tracked persists registered at plan build
        throw new RuntimeException("boom")
      }
    }
    assert(Caches.trackedCount == 0, "failure path must still release")
  }

  test("the full survivors pipeline releases everything after releaseAll") {
    clean()
    val d = docs
    val pairs = Dedup.ngramJaccard(d, k = 3, threshold = 0.5,
      maxShingleDf = 1000, hashShingles = true, prefixFilter = true)
      .select("doc_a", "doc_b")
    val losers = Dedup.duplicateClusters(pairs)
      .filter(col("doc_id") =!= col("cluster"))
    d.join(losers, Seq("doc_id"), "left_anti").select("doc_id")
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("survivors pipeline")
  }

  // ---- graph-loop end-of-run hygiene (r15, the r14 verdict's item 7):
  // the iterative operators accumulate checkpoint leaves — the edge base,
  // per-round state caps, degree/marginal frames. The r14 driver run
  // measured graph_pagerank_weighted's END-OF-SUITE retry at 4.3× its
  // main-run median, a signature consistent with leaked BlockManager
  // state; these pins make "releaseAll drains every loop's blocks" a
  // failing test instead of an audit. ----

  private def symEdges = {
    val rnd = new scala.util.Random(5)
    import spark.implicits._
    val raw = Seq.fill(400)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    (raw ++ raw.map(_.swap)).toDF("src", "dst")
  }

  test("pageRankWeighted loop releases every checkpoint leaf after releaseAll") {
    clean()
    Graph.pageRankWeighted(
        symEdges.groupBy("src", "dst").agg(count(lit(1)).as("w")),
        iterations = 5)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("pageRankWeighted")
  }

  test("the louvain2_q composition releases every leaf after releaseAll") {
    clean()
    val (l1raw, base) = Graph.louvainMoveWithBase(symEdges,
      iterations = 3, symmetric = true)
    val l1 = Caches.persistTracked(l1raw)
    val g2 = Graph.coarsen(base.select("src", "dst"), l1)
    val l2 = Graph.louvainMoveWeighted(g2, iterations = 2,
      weight = "weight", symmetric = true, localEdgeCap = 1000000L)
    // the wired composition's exact mapping shape
    val mapped = l1.join(l2.select(col("node").as("label"),
        col("label").as("label2")), "label")
      .select(col("node"), col("label2").as("label"))
    Graph.modularityTotal(base.select("src", "dst"), mapped)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("louvain2_q composition")
  }

  test("hits and personalizedPageRankMinSeeds release everything") {
    clean()
    Graph.hits(symEdges, iterations = 3)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("hits")
    Graph.personalizedPageRankMinSeeds(symEdges, nSeeds = 3, iterations = 3)
      .write.format("noop").mode("overwrite").save()
    assertAllReleased("personalizedPageRankMinSeeds")
  }
}
