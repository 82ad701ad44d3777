package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Event with a distinct user key for the stream-stream interval join. */
case class AttEv(event_id: Long, user_id: Long, ts: Timestamp,
    event_type: String, value: Double)

/** Timestamped embedding row for the streaming IVF ingest twin. */
case class VecEv(vec_id: Long, ts: Timestamp, embedding: Seq[Float])

/** Structured Streaming twin of the batch events queries, driven end-to-end
  * over MemoryStream. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("hourlyByType aggregates tumbling event-time windows") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventsStreaming.hourlyByType(in.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      in.addData(
        Ev(1, t(10, 5), "click", 1.0), Ev(2, t(10, 40), "click", 2.0),
        Ev(3, t(10, 59), "view", 5.0), Ev(4, t(11, 1), "click", 4.0))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(got == Set(
        (t(10, 0), "click", 2L, 3.0),
        (t(10, 0), "view", 1L, 5.0),
        (t(11, 0), "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("GraphStreaming.maintainComponents == from-scratch components after every batch") {
    import graft.operators.{Caches, Graph}
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    // other suites in the shared JVM may legitimately hold index-registry
    // entries — assert we return to THIS baseline, not to zero
    val indexBaseline = graft.operators.Caches.trackedIndexCount
    val (view, q) = GraphStreaming.maintainComponents(
      in.toDF().toDF("src", "dst"))
    // three micro-batches: grow two chains, bridge them, hang new nodes
    val batches = Seq(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      Seq((3L, 10L), (20L, 21L)),          // bridge + a fresh component
      Seq((21L, 22L), (1L, 2L)))           // new node + a replayed edge
    try {
      var seen = Seq.empty[(Long, Long)]
      for (b <- batches) {
        in.addData(b: _*)
        q.processAllAvailable()
        seen ++= b
        val got = view.view.as[(Long, Long)].collect().toMap
        val want = Graph.connectedComponents(seen.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        Caches.releaseAll()
        assert(got == want, s"after batch $b")
      }
      // idempotent replay: re-folding an already-applied batch leaves the
      // view unchanged (its edges contract to self-loops and drop)
      val before = view.view.as[(Long, Long)].collect().toMap
      in.addData(batches(1): _*)
      q.processAllAvailable()
      val after = view.view.as[(Long, Long)].collect().toMap
      assert(after == before, "replayed batch must be a no-op")
    } finally {
      q.stop()
      view.release()
      assert(Caches.trackedIndexCount == indexBaseline,
        "released view must not leak index-registry entries")
    }
  }

  test("hourlyByType batch/streaming parity: same transform on a static frame") {
    val batch = Seq(
      Ev(1, t(10, 5), "click", 1.0), Ev(2, t(10, 40), "click", 2.0),
      Ev(3, t(11, 1), "view", 4.0)).toDF()
    val got = EventsStreaming.hourlyByType(batch)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(got == Set((t(10, 0), "click", 2L, 3.0), (t(11, 0), "view", 1L, 4.0)))
  }

  test("hourlyDistinctUsers: exact windowed COUNT(DISTINCT) via dedup-then-aggregate; batch twin agrees") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AttEv]
    val q = EventsStreaming.hourlyDistinctUsers(in.toDF())
      .writeStream.format("memory").queryName("distinct_users")
      .outputMode("append").start()
    try {
      in.addData(
        AttEv(1, 100, t(10, 5), "c", 0), AttEv(2, 100, t(10, 30), "c", 0),
        AttEv(3, 101, t(10, 45), "c", 0), AttEv(4, 100, t(11, 10), "c", 0))
      q.processAllAvailable()
      // push the watermark past both windows so append mode finalizes them
      in.addData(AttEv(9, 999, t(20, 0), "c", 0))
      q.processAllAvailable()
      val streamed = spark.table("distinct_users")
        .as[(Timestamp, Long)].collect().toSet
      // user 100 counted ONCE in 10:00 despite two events; again in 11:00
      assert(streamed == Set((t(10, 0), 2L), (t(11, 0), 1L)))
      // the one-aggregate batch form (groupBy window + countDistinct —
      // the spelling streaming rejects) gives the same answer
      val evs = Seq(
        AttEv(1, 100, t(10, 5), "c", 0), AttEv(2, 100, t(10, 30), "c", 0),
        AttEv(3, 101, t(10, 45), "c", 0), AttEv(4, 100, t(11, 10), "c", 0))
      val batch = evs.toDF()
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"))
        .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n"))
        .select($"window.start", $"n")
        .as[(Timestamp, Long)].collect().toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("ivfIngestAssign/ivfIngestCellCounts: streaming IVF ingest ≡ batch assignCells, any arrival order") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Similarity
    // four plan-constant centroids in 2-D; vectors land deterministically
    val centroids = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(10.0, 10.0))
    val rnd = new scala.util.Random(11)
    val rows = (0 until 40).map { i =>
      val c = centroids(rnd.nextInt(4))
      VecEv(i.toLong, t(9 + rnd.nextInt(3), rnd.nextInt(60)),
        Seq((c(0) + rnd.nextDouble()).toFloat, (c(1) + rnd.nextDouble()).toFloat))
    }
    val shuffled = rnd.shuffle(rows) // out-of-order arrival
    val in = MemoryStream[VecEv]
    // (a) the stateless assignment twin — append straight through
    val qa = EventsStreaming.ivfIngestAssign(in.toDF(), centroids)
      .select("vec_id", "cell")
      .writeStream.format("memory").queryName("ivf_assign")
      .outputMode("append").start()
    // (b) the watermark-final drift histogram
    val qc = EventsStreaming.ivfIngestCellCounts(in.toDF(), centroids)
      .writeStream.format("memory").queryName("ivf_cells")
      .outputMode("append").start()
    try {
      shuffled.grouped(7).foreach { g => in.addData(g); qa.processAllAvailable(); qc.processAllAvailable() }
      // push the watermark past every window so append mode finalizes
      in.addData(VecEv(999L, t(23, 0), Seq(0f, 0f)))
      qa.processAllAvailable(); qc.processAllAvailable()
      val batchVecs = rows.toDF()
        .select($"vec_id", $"ts", $"embedding")
      // law (a): streaming assignment ≡ batch assignCells on the closed
      // stream (the sentinel row included — per-row purity, any order)
      val streamedAssign = spark.table("ivf_assign")
        .as[(Long, Int)].collect().toMap
      val batchAssign = Similarity.assignCells(
          batchVecs.union(Seq(VecEv(999L, t(23, 0), Seq(0f, 0f))).toDF()
            .select($"vec_id", $"ts", $"embedding")),
          centroids)
        .as[(Long, Int)].collect().toMap
      assert(streamedAssign == batchAssign)
      assert(streamedAssign.size == 41)
      // law (b): finalized (window, cell) counts ≡ the batch
      // window/count aggregation over assignCells (sentinel's window is
      // NOT finalized — watermark sits at its event time — so exclude it)
      val streamedCounts = spark.table("ivf_cells")
        .as[(Timestamp, Int, Long)].collect().toSet
      val batchCounts = EventsStreaming.ivfIngestAssign(batchVecs, centroids)
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"cell")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .select($"window.start", $"cell", $"n")
        .as[(Timestamp, Int, Long)].collect().toSet
      assert(streamedCounts == batchCounts)
      // the histogram actually spans multiple cells (drift is observable)
      assert(streamedCounts.map(_._2).size >= 3)
    } finally { qa.stop(); qc.stop() }
  }

  test("hoppingByType: each event lands in exactly two overlapping windows; batch ≡ streaming") {
    implicit val ctx = spark.sqlContext
    val evs = Seq(
      Ev(1, t(10, 5), "click", 1.0), Ev(2, t(10, 40), "click", 2.0),
      Ev(3, t(10, 59), "view", 5.0), Ev(4, t(11, 1), "click", 4.0))
    val in = MemoryStream[Ev]
    val q = EventsStreaming.hoppingByType(in.toDF())
      .writeStream.format("memory").queryName("hopping")
      .outputMode("complete").start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("hopping")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      // 10:05 → windows starting 09:30 and 10:00, etc. (duration/slide = 2)
      assert(streamed == Set(
        (t(9, 30), "click", 1L, 1.0),   // ev1
        (t(10, 0), "click", 2L, 3.0),   // ev1+ev2
        (t(10, 0), "view", 1L, 5.0),    // ev3
        (t(10, 30), "click", 2L, 6.0),  // ev2+ev4
        (t(10, 30), "view", 1L, 5.0),   // ev3
        (t(11, 0), "click", 1L, 4.0)))  // ev4
      // the same transform on a static frame gives the identical table
      val batch = EventsStreaming.hoppingByType(evs.toDF())
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("hoppingByType append mode: overlapping windows close at different watermark times") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventsStreaming.hoppingByType(in.toDF(), watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("hopping_append")
      .outputMode("append").start()
    try {
      // one event in two windows: [09:30,10:30) and [10:00,11:00)
      in.addData(Ev(1, t(10, 5), "click", 1.0))
      q.processAllAvailable()
      // watermark → 10:30: closes ONLY the earlier window of the pair
      in.addData(Ev(2, t(11, 0), "view", 2.0))
      q.processAllAvailable()
      val afterFirst = spark.table("hopping_append")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(afterFirst == Set((t(9, 30), "click", 1L, 1.0)),
        s"only the 09:30 window should have closed, got $afterFirst")
      // watermark → 11:30 (12:00 - 30min): closes the 10:00 and 10:30 windows
      in.addData(Ev(3, t(12, 0), "click", 3.0))
      q.processAllAvailable()
      val afterSecond = spark.table("hopping_append")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(afterSecond.contains((t(10, 0), "click", 1L, 1.0)),
        s"the later window of the pair must close on the second advance: $afterSecond")
    } finally q.stop()
  }

  test("hourlyByType append mode: watermark closes windows, late data dropped") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventsStreaming.hourlyByType(in.toDF(), watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, t(10, 5), "click", 1.0), Ev(2, t(10, 30), "click", 2.0))
      q.processAllAvailable()
      // advance event time far enough that the 10:00 window closes
      in.addData(Ev(3, t(12, 0), "view", 9.0))
      q.processAllAvailable()
      // a late event for the closed 10:00 window must be DROPPED
      in.addData(Ev(4, t(10, 45), "click", 100.0))
      in.addData(Ev(5, t(12, 5), "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("hourly_append")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      // only the closed 10:00 window is emitted, WITHOUT the late event
      assert(got == Set((t(10, 0), "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("dedupByContent drops same-text documents within the watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = EventsStreaming.dedupByContent(docs)
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, t(10, 0), "the same document text"),
        (2L, t(10, 1), "the same document text"), // dup content, new id
        (3L, t(10, 2), "a different document"))
      q.processAllAvailable()
      val ids = spark.table("content_dedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 3L))
    } finally q.stop()
  }

  test("dedupBySimhash drops signature-identical near-dups, keeps distinct docs") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = EventsStreaming.dedupBySimhash(docs)
      .writeStream.format("memory").queryName("simhash_dedup")
      .outputMode("append").start()
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      in.addData(
        (1L, t(10, 0), base),
        (2L, t(10, 1), "  " + base + "  "),  // whitespace variant — same shingles
        (3L, t(10, 2), base),                // exact dup
        (4L, t(10, 3), "totally different content with other words entirely here"))
      q.processAllAvailable()
      val ids = spark.table("simhash_dedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 4L))
      // the streaming signature IS the batch signature (same expression):
      // whatever batch simhashPairs pairs at hamming 0, this drops
      import graft.functions.TextFunctions.{shingleHashes, simhashSig}
      import org.apache.spark.sql.functions.col
      val sigs = Seq(base, "  " + base + "  ").toDF("text")
        .select(simhashSig(shingleHashes(col("text"), 3))).as[Long].collect()
      assert(sigs(0) == sigs(1))
    } finally q.stop()
  }

  test("dedupIncrementalBySimhash: static-base anti-join + in-stream first-wins") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val accepted = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fresh = "completely unrelated subject matter discussing other things"
    val fresh2 = "yet another body of text about entirely separate topics"
    val baseSigs = EventsStreaming.simhashSignatures(
      Seq(accepted).toDF("text"))
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = EventsStreaming.dedupIncrementalBySimhash(docs, baseSigs)
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, t(10, 0), accepted),            // dup of the BASE — dropped
        (2L, t(10, 1), "  " + accepted),     // whitespace variant of base — dropped
        (3L, t(10, 2), fresh),               // new content — admitted
        (4L, t(10, 3), fresh),               // in-stream dup of 3 — dropped
        (5L, t(10, 4), fresh2))              // new content — admitted
      q.processAllAvailable()
      val ids = spark.table("inc_dedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(3L, 5L))
    } finally q.stop()
  }

  test("dedupIncrementalBySimhash ≡ batch incrementalNearDup on closed exact-copy streams") {
    // THE LAW tying the streaming twin to the wired batch row: on a
    // corpus of exact-copy groups (where near-dup groups at the batch
    // row's Jaccard 0.5 coincide with signature-equal groups) and event
    // time following doc_id (where first-arrival = min-id), the stream's
    // admitted set equals Dedup.incrementalNearDup's survivors exactly.
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(71)
    // a pool of mutually-distant texts (disjoint vocabularies → Jaccard
    // ~0 and distinct signatures across groups)
    val pool = (0 until 12).map { g =>
      (0 until 10).map(i => s"w${g}x${g * 31 + i * 7}").mkString(" ")
    }
    for (trial <- 1 to 2) {
      // each group contributes 0-2 base copies and 0-2 batch copies
      val base = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val batch = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var id = 0L
      pool.foreach { text =>
        (0 until rnd.nextInt(3)).foreach { _ =>
          base += ((id, text)); id += 1 }
        (0 until rnd.nextInt(3)).foreach { _ =>
          batch += ((id, text)); id += 1 }
      }
      val baseDf = base.toSeq.toDF("doc_id", "text")
      val batchDf = batch.toSeq.toDF("doc_id", "text")
      val want = graft.operators.Dedup.incrementalNearDup(
          baseDf, batchDf, k = 3, threshold = 0.5, loopParts = 1)
        .as[Long].collect().toSet
      graft.operators.Caches.releaseAll()
      val baseSigs = EventsStreaming.simhashSignatures(baseDf)
      val in = MemoryStream[(Long, Timestamp, String)]
      val docs = in.toDF().toDF("doc_id", "ts", "text")
      val q = EventsStreaming.dedupIncrementalBySimhash(docs, baseSigs)
        .writeStream.format("memory").queryName(s"inc_law_$trial")
        .outputMode("append").start()
      try {
        // event time follows doc_id: first arrival = min id
        in.addData(batch.toSeq.sortBy(_._1).map { case (i, text) =>
          (i, t(10, i.toInt), text) }: _*)
        q.processAllAvailable()
        val got = spark.table(s"inc_law_$trial").select("doc_id")
          .as[Long].collect().toSet
        assert(got == want, s"trial $trial: stream $got vs batch $want")
      } finally q.stop()
    }
  }

  test("attributionPairs: watermarked stream-stream interval join, out-of-order click, ≡ batch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AttEv]
    val df = in.toDF()
    val q = EventsStreaming.attributionPairs(
        df.filter($"event_type" === "purchase"),
        df.filter($"event_type" === "click"),
        lookback = "1 hour", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    def us(h: Int, m: Int) = t(h, m).getTime * 1000L
    try {
      in.addData(
        AttEv(10, 1, t(10, 0), "click", 0),    // exactly lookback before → excluded
        AttEv(11, 1, t(10, 30), "click", 0),
        AttEv(20, 1, t(11, 0), "purchase", 50.0),
        AttEv(12, 2, t(11, 30), "click", 0),
        AttEv(21, 2, t(11, 45), "purchase", 20.0),
        AttEv(22, 3, t(11, 50), "purchase", 9.0)) // no clicks → no pair
      q.processAllAvailable()
      // a LATE click (above watermark) matching the already-arrived
      // purchase 21 — two-sided join state must still pair it
      in.addData(AttEv(13, 2, t(11, 40), "click", 0))
      q.processAllAvailable()
      // advance both sides' watermarks with non-matching users
      in.addData(AttEv(98, 8, t(15, 0), "click", 0),
        AttEv(99, 9, t(15, 0), "purchase", 0))
      q.processAllAvailable()
      val got = spark.table("attr")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(got == Set(
        (20L, 11L, 1L, us(11, 0), us(10, 30), 50.0),
        (21L, 12L, 2L, us(11, 45), us(11, 30), 20.0),
        (21L, 13L, 2L, us(11, 45), us(11, 40), 20.0)))
      // batch ≡ streaming: the same transform over the closed static frame
      val all = Seq(
        AttEv(10, 1, t(10, 0), "click", 0), AttEv(11, 1, t(10, 30), "click", 0),
        AttEv(20, 1, t(11, 0), "purchase", 50.0),
        AttEv(12, 2, t(11, 30), "click", 0), AttEv(21, 2, t(11, 45), "purchase", 20.0),
        AttEv(22, 3, t(11, 50), "purchase", 9.0), AttEv(13, 2, t(11, 40), "click", 0),
        AttEv(98, 8, t(15, 0), "click", 0), AttEv(99, 9, t(15, 0), "purchase", 0))
        .toDF()
      val batch = EventsStreaming.attributionPairs(
          all.filter($"event_type" === "purchase"),
          all.filter($"event_type" === "click"), lookback = "1 hour")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("sessionize: gap-split sessions, timeout close, agrees with batch rule") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val events = in.toDF()
    val q = EventsStreaming.sessionize(events.selectExpr("event_id AS user_id", "ts", "event_type", "value"),
        gapMinutes = 30, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two sessions (gap 40 min); user 2: one session
      in.addData(
        Ev(1, t(10, 0), "c", 0), Ev(1, t(10, 10), "c", 0), // sess A: 2 events
        Ev(1, t(10, 50), "c", 0), // > 30 min gap → sess B opens
        Ev(2, t(10, 5), "c", 0))
      q.processAllAvailable()
      // advance watermark far past every open session's horizon
      in.addData(Ev(9, t(14, 0), "c", 0))
      q.processAllAvailable()
      in.addData(Ev(9, t(15, 0), "c", 0)) // second advance so timeouts fire
      q.processAllAvailable()
      val got = spark.table("sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      def us(h: Int, m: Int) = t(h, m).getTime * 1000L
      assert(got.contains((1L, us(10, 0), 2L, 10L * 60 * 1000000)))
      assert(got.contains((1L, us(10, 50), 1L, 0L)))
      assert(got.contains((2L, us(10, 5), 1L, 0L)))
    } finally q.stop()
  }

  test("sessionizeBuiltin (native session_window): exact-gap boundary matches the batch rule; batch ≡ streaming") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val events = in.toDF()
      .selectExpr("event_id AS user_id", "ts", "event_type", "value")
    val q = EventsStreaming.sessionizeBuiltin(events, gapMinutes = 30,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sessions_native")
      .outputMode("append").start()
    def us(h: Int, m: Int) = t(h, m).getTime * 1000L
    try {
      in.addData(
        Ev(1, t(10, 0), "c", 0), Ev(1, t(10, 30), "c", 0), // EXACTLY gap → same session (the batch rule)
        Ev(1, t(11, 30), "c", 0),                          // > gap → new session
        Ev(2, t(10, 5), "c", 0))
      q.processAllAvailable()
      in.addData(Ev(9, t(15, 0), "c", 0)) // watermark far past every window end
      q.processAllAvailable()
      val got = spark.table("sessions_native")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        (1L, us(10, 0), 2L, 30L * 60 * 1000000),
        (1L, us(11, 30), 1L, 0L),
        (2L, us(10, 5), 1L, 0L)))
      // batch ≡ streaming: the same transform on the closed static frame
      val all = Seq(
        Ev(1, t(10, 0), "c", 0), Ev(1, t(10, 30), "c", 0),
        Ev(1, t(11, 30), "c", 0), Ev(2, t(10, 5), "c", 0),
        Ev(9, t(15, 0), "c", 0)).toDF()
        .selectExpr("event_id AS user_id", "ts", "event_type", "value")
      val batch = EventsStreaming.sessionizeBuiltin(all, gapMinutes = 30)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(batch == got + ((9L, us(15, 0), 1L, 0L)))
    } finally q.stop()
  }

  test("sessionize state survives a checkpointed restart (exactly-once recovery)") {
    implicit val ctx = spark.sqlContext
    // the memory sink refuses checkpoint recovery (not fault-tolerant);
    // the FILE sink is the real exactly-once pair for a restartable query
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sess_out_").toString
    val in = MemoryStream[Ev]
    def start() = EventsStreaming.sessionize(
        in.toDF().selectExpr("event_id AS user_id", "ts", "event_type", "value"),
        gapMinutes = 30, watermarkDelay = "10 minutes")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // first incarnation: open a session for user 1, then die mid-stream
    val q1 = start()
    try {
      in.addData(Ev(1, t(10, 0), "c", 0), Ev(1, t(10, 10), "c", 0))
      q1.processAllAvailable() // session open in state, nothing emitted yet
    } finally q1.stop()
    // second incarnation from the SAME checkpoint: the 10:20 event must
    // extend the session recovered from state, not open a fresh one
    val q2 = start()
    try {
      in.addData(Ev(1, t(10, 20), "c", 0))
      q2.processAllAvailable()
      in.addData(Ev(9, t(14, 0), "c", 0)); q2.processAllAvailable()
      in.addData(Ev(9, t(15, 0), "c", 0)); q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .selectExpr("user_id", "session_start_us", "n_events", "duration_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      def us(h: Int, m: Int) = t(h, m).getTime * 1000L
      // 3 events across the restart boundary in ONE session — only
      // possible if the pre-restart state was recovered from checkpoint
      assert(got.contains((1L, us(10, 0), 3L, 20L * 60 * 1000000)),
        s"session state lost across restart: $got")
    } finally q2.stop()
  }

  test("sessionize drops an event behind the watermark without crashing") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // delay 2h, gap 30 min. FlatMapGroupsWithStateExec filters input rows
    // whose event time is behind the CURRENT watermark before the state
    // function sees them — so an 08:30 event against a 10:00 watermark
    // must silently disappear (no session, no state) and, critically, must
    // not crash the query (the state function never sees a row whose gap
    // horizon could sit at/behind the watermark; sessionize's timeout clamp
    // additionally guards the setTimeoutTimestamp > watermark contract at
    // the boundary).
    val q = EventsStreaming.sessionize(
        in.toDF().selectExpr("event_id AS user_id", "ts", "event_type", "value"),
        gapMinutes = 30, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      in.addData(Ev(2, t(12, 0), "c", 0)) // watermark → 10:00 after this batch
      q.processAllAvailable()
      in.addData(Ev(1, t(8, 30), "c", 0)) // behind the 10:00 watermark
      q.processAllAvailable() // must not crash
      // advance the watermark twice so every surviving session times out
      in.addData(Ev(9, t(16, 0), "c", 0)); q.processAllAvailable()
      in.addData(Ev(9, t(18, 0), "c", 0)); q.processAllAvailable()
      val got = spark.table("sessions_late")
        .as[(Long, Long, Long, Long)].collect().toSet
      def us(h: Int, m: Int) = t(h, m).getTime * 1000L
      assert(got.contains((2L, us(12, 0), 1L, 0L)))
      assert(!got.exists(_._1 == 1L), s"late event must be dropped, got $got")
    } finally q.stop()
  }

  test("sessionize agrees with the batch gap rule on randomized streams") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // 5 users, ~80 events over 6 hours — gaps straddle the 30-min rule
    val evs = (1 to 80).map { i =>
      Ev(rnd.nextInt(5).toLong + 1L, t(9 + rnd.nextInt(6), rnd.nextInt(60)), "c", 0)
    }
    // in-memory reference of the batch rule (sorted per user, 30-min gaps)
    val gapUs = 30L * 60 * 1000000
    val expected = evs.groupBy(_.event_id).flatMap { case (u, es) =>
      val us = es.map(_.ts.getTime * 1000L).sorted
      val sessions = us.foldLeft(List.empty[List[Long]]) {
        case (Nil, x) => List(List(x))
        case (cur :: done, x) if x - cur.head <= gapUs => (x :: cur) :: done
        case (acc, x) => List(x) :: acc
      }
      sessions.map(s => (u, s.min, s.size.toLong, s.max - s.min))
    }.toSet
    val in = MemoryStream[Ev]
    val q = EventsStreaming.sessionize(
        in.toDF().selectExpr("event_id AS user_id", "ts", "event_type", "value"),
        gapMinutes = 30, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions_rand")
      .outputMode("append").start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      // two far-future sentinel batches so every open session times out
      in.addData(Ev(99, t(20, 0), "c", 0)); q.processAllAvailable()
      in.addData(Ev(99, t(22, 0), "c", 0)); q.processAllAvailable()
      val got = spark.table("sessions_rand")
        .as[(Long, Long, Long, Long)].collect().toSet
        .filter(_._1 != 99L)
      assert(got == expected)
    } finally q.stop()
  }

  test("asofJoin streaming twin: out-of-order delivery, equal-ts inclusive, " +
    "agrees with batch AsOf.asofJoin") {
    implicit val ctx = spark.sqlContext
    // left clicks (user_id, ts, event_id); right views (user_id, ts, value)
    val lefts = Seq(
      (1L, t(9, 30), 10L),  // before any view → None
      (1L, t(10, 0), 11L),  // equal-ts to a view → inclusive match
      (1L, t(10, 30), 12L), (1L, t(11, 30), 13L),
      (2L, t(10, 10), 20L), (2L, t(10, 20), 21L))
    val rights = Seq(
      (1L, t(10, 0), 1.0), (1L, t(11, 0), 2.0),
      (2L, t(10, 15), 5.0))
    val inL = MemoryStream[(Long, Timestamp, Long)]
    val inR = MemoryStream[(Long, Timestamp, Double)]
    val q = EventsStreaming.asofJoin(
        inL.toDF().toDF("user_id", "ts", "event_id"),
        inR.toDF().toDF("user_id", "ts", "view_value"),
        "user_id", "ts", "event_id", "view_value")
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // batch 1: everything EXCEPT the 10:00 view — which then arrives
      // out of order in batch 2, still inside the 2h watermark horizon;
      // the answers for 10:00/10:30 lefts must wait for it and be correct
      inL.addData(lefts.map(l => (l._1, l._2, l._3)): _*)
      inR.addData(rights.tail.map(r => (r._1, r._2, r._3)): _*)
      q.processAllAvailable()
      inR.addData(rights.head)
      q.processAllAvailable()
      // far-future sentinels on BOTH streams (global watermark = min over
      // sources), twice so timeouts fire after the advance
      inL.addData((99L, t(20, 0), 999L)); inR.addData((99L, t(20, 0), 0.0))
      q.processAllAvailable()
      inL.addData((99L, t(22, 0), 998L)); inR.addData((99L, t(22, 0), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_stream")
        .as[AsofOut].collect().filter(_.key != 99L).toSet
      // batch reference: the DuckDB-certified AsOf.asofJoin on static frames
      val expected = graft.operators.AsOf.asofJoin(
          lefts.toDF("user_id", "ts", "event_id"),
          rights.toDF("user_id", "ts", "view_value"),
          Seq("user_id"), "ts", Seq("view_value"))
        .selectExpr("event_id", "user_id", "unix_micros(ts)", "asof_view_value")
        .as[(Long, Long, Long, Option[Double])].collect()
        .map(r => AsofOut(r._1, r._2, r._3, r._4)).toSet
      assert(got == expected)
      // spot-check the semantics the fixture plants
      def valOf(id: Long) = got.find(_.left_id == id).get.asof_value
      assert(valOf(10L).isEmpty)          // before any view
      assert(valOf(11L).contains(1.0))    // equal-ts inclusive
      assert(valOf(13L).contains(2.0))    // latest-preceding, not first
    } finally q.stop()
  }

  test("asofJoin agrees with batch AsOf.asofJoin on randomized streams") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // 4 keys; rights unique per (key, ts) per the operator contract
    val lefts = (1 to 60).map { i =>
      (rnd.nextInt(4).toLong + 1L, t(9 + rnd.nextInt(6), rnd.nextInt(60)), i.toLong)
    }
    val rights = (1 to 40).map { i =>
      (rnd.nextInt(4).toLong + 1L, t(9 + rnd.nextInt(6), rnd.nextInt(60)),
        rnd.nextInt(100).toDouble)
    }.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val inL = MemoryStream[(Long, Timestamp, Long)]
    val inR = MemoryStream[(Long, Timestamp, Double)]
    val q = EventsStreaming.asofJoin(
        inL.toDF().toDF("user_id", "ts", "event_id"),
        inR.toDF().toDF("user_id", "ts", "view_value"),
        "user_id", "ts", "event_id", "view_value",
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("asof_rand")
      .outputMode("append").start()
    try {
      // deliver in time-sorted slices (so the 1-minute watermark drops
      // nothing) but UNSORTED within each slice — the watermark only
      // advances between batches, so within-batch disorder exercises the
      // out-of-order buffering on every batch
      val tagged = lefts.map(l => Left(l)) ++ rights.map(r => Right(r))
      val slices = tagged.sortBy(_.fold(_._2, _._2).getTime).grouped(25)
      slices.foreach { slice =>
        val sl = rnd.shuffle(slice)
        sl.foreach {
          case Left(l)  => inL.addData(l)
          case Right(r) => inR.addData(r)
        }
        q.processAllAvailable()
      }
      inL.addData((99L, t(22, 0), 999L)); inR.addData((99L, t(22, 0), 0.0))
      q.processAllAvailable()
      inL.addData((99L, t(23, 0), 998L)); inR.addData((99L, t(23, 0), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_rand")
        .as[AsofOut].collect().filter(_.key != 99L).toSet
      val expected = graft.operators.AsOf.asofJoin(
          lefts.toDF("user_id", "ts", "event_id"),
          rights.toDF("user_id", "ts", "view_value"),
          Seq("user_id"), "ts", Seq("view_value"))
        .selectExpr("event_id", "user_id", "unix_micros(ts)", "asof_view_value")
        .as[(Long, Long, Long, Option[Double])].collect()
        .map(r => AsofOut(r._1, r._2, r._3, r._4)).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("incremental file ingest: AvailableNow curates each epoch's files exactly once") {
    // The production shape for a GROWING corpus directory: a nightly job
    // runs the curation as a file-source stream with Trigger.AvailableNow —
    // it processes everything new since the checkpoint, writes, and
    // terminates. The file-source checkpoint (not file naming, not caller
    // bookkeeping) guarantees each input file is curated EXACTLY ONCE
    // across job incarnations: epoch-1 docs must appear once in the output
    // after epoch 2's run, not twice, and epoch-2 docs must be picked up
    // with no manual delta tracking.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.operators.CorpusMix
    import graft.functions.TextFunctions
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ingest_src_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt_").toString
    try {
    def mkDocs(ids: Range) = ids.map { i =>
      (i.toLong, s"document number $i carries several distinct words $i", s"src${i % 3}")
    }
    val epoch1 = mkDocs(1 to 40)
    val epoch2 = mkDocs(41 to 80)
    def curate(df: org.apache.spark.sql.DataFrame) =
      CorpusMix.sampleByStratum(
        df.withColumn("quality", TextFunctions.qualityScore(col("text")))
          .filter(col("quality") >= 0.2).drop("quality")
          .filter(pmod(col("doc_id"), lit(7)) =!= 0),
        "source", Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0))
    val schema = epoch1.toDF("doc_id", "text", "source").schema
    def runOnce(): Unit = {
      val q = curate(spark.readStream.schema(schema).parquet(srcDir))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .outputMode("append").start()
      q.awaitTermination()
    }
    epoch1.toDF("doc_id", "text", "source").write.mode("append").parquet(srcDir)
    runOnce()
    val after1 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted.toSeq
    val batch1 = curate(epoch1.toDF("doc_id", "text", "source"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after1 == batch1 && batch1.nonEmpty)
    epoch2.toDF("doc_id", "text", "source").write.mode("append").parquet(srcDir)
    runOnce()
    val after2 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted.toSeq
    val batchAll = curate((epoch1 ++ epoch2).toDF("doc_id", "text", "source"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    // exactly-once across incarnations: epoch-1 members appear ONCE (the
    // sorted-seq equality fails on any duplicate), epoch-2 members arrive
    assert(after2 == batchAll, s"incremental run diverged: $after2 vs $batchAll")
    assert(after2.exists(_ > 40L), "epoch-2 docs must be picked up")
    assert(after2.size > after1.size)
    } finally {
      // the sibling IVF tests' cleanup pattern: repeated suite runs must
      // not accumulate parquet/checkpoint debris in tmp
      import scala.reflect.io.Directory
      Seq(srcDir, outDir, ckpt).foreach(d =>
        new Directory(new java.io.File(d)).deleteRecursively())
    }
  }

  test("stateless curation stages (quality filter + corpus mix) run unchanged on a stream") {
    // CorpusMix and the quality filter are stateless narrow transforms —
    // the SAME DataFrame => DataFrame definition must serve readStream
    // (live curation at ingest) and spark.read (backfill), with identical
    // membership. Stateful stages (dedup survivors, decontamination) need
    // batch compaction or dedicated streaming twins; these two do not.
    implicit val ctx = spark.sqlContext
    import graft.operators.CorpusMix
    import graft.functions.TextFunctions
    val docs = (1 to 60).map { i =>
      (i.toLong, s"document number $i carries several distinct words $i", s"src${i % 3}")
    }
    def curate(df: org.apache.spark.sql.DataFrame) =
      CorpusMix.sampleByStratum(
        df.withColumn("quality", TextFunctions.qualityScore(org.apache.spark.sql.functions.col("text")))
          .filter(org.apache.spark.sql.functions.col("quality") >= 0.2)
          .drop("quality"),
        "source", Map("src0" -> 0.5, "src1" -> 0.0))
    val in = MemoryStream[(Long, String, String)]
    val q = curate(in.toDF().toDF("doc_id", "text", "source"))
      .writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    try {
      docs.grouped(20).foreach { batch => in.addData(batch: _*); q.processAllAvailable() }
      val streamed = spark.table("mix_stream").select("doc_id")
        .as[Long].collect().sorted.toSeq
      val batch = curate(docs.toDF("doc_id", "text", "source"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.size < docs.size) // the cut actually cuts
      assert(!streamed.exists(id => docs(id.toInt - 1)._3 == "src1")) // rate 0 stratum gone
    } finally q.stop()
  }

  test("COMPOSED streaming curation: quality → dedup → strict decontamination → mix ≡ batch") {
    // The full curation chain (minus packing, which is inherently a batch
    // compaction) on a live stream. Stage-by-stage streaming story:
    //  - quality filter, eval-member filter, MIX: stateless narrow — the
    //    same Column definitions run verbatim;
    //  - exact dedup: dropDuplicates("text") — streaming keeps the FIRST
    //    arrival per text, so with docs ingested in doc_id order (the
    //    natural ingest order) it equals the batch min-doc_id survivor
    //    rule. The batch twin below uses the certified groupBy-min form;
    //  - STRICT decontamination: re-expressed STATELESSLY as a per-row
    //    arrays_overlap against the eval shingle-hash set baked as a plan
    //    constant. Benchmarks are bounded by definition (the
    //    Decontaminate broadcast argument), so the eval set fits a plan
    //    literal the same way it fits a broadcast; at 10^6 shingles a
    //    production stream would hold it in a broadcast variable, but the
    //    semantics — drop any doc sharing ONE 3-shingle with eval — are
    //    identical and exact (no Bloom false positives to close).
    implicit val ctx = spark.sqlContext
    import graft.operators.CorpusMix
    import graft.functions.TextFunctions
    import org.apache.spark.sql.functions._
    // every 3-token window of baseText contains the doc's own id, so
    // distinct docs share NO shingle; planted structure: %10==3 (i>10) =
    // duplicate chain of doc 3's text, %10==6 = punct junk the quality
    // filter cuts, %10==9 = leaks eval doc 14's opening shingle, %7==0 =
    // eval (benchmark) members
    // i == 63 is excluded from the duplicate chain: it is an eval member
    // (63 % 7 == 0), and giving it doc 3's text would put that text's
    // shingles into the eval set — the whole chain would then fall to
    // decontamination instead of exercising the dedup stage
    def text(i: Long): String =
      if (i % 10 == 3 && i > 10 && i != 63) text(i - 10)
      else if (i % 10 == 6) "! ! !"
      else if (i % 10 == 9) s"$i xx yy 14 aa bb"
      else s"$i aa bb $i cc dd $i"
    val docs = (1L to 90L).map(i => (i, text(i), s"src${i % 3}"))
    val docsDf = docs.toDF("doc_id", "text", "source")
    val evalSh: Array[Long] = docsDf.filter(col("doc_id") % 7 === 0)
      .select(explode(array_distinct(
        TextFunctions.shingleHashes(col("text"), 3))).as("s"))
      .distinct().as[Long].collect().sorted
    def stages(df: org.apache.spark.sql.DataFrame) =
      CorpusMix.sampleByStratum(
        df.withColumn("quality", TextFunctions.qualityScore(col("text")))
          .filter(col("quality") >= 0.2).drop("quality")
          .filter(pmod(col("doc_id"), lit(7)) =!= 0)
          .filter(!arrays_overlap(
            array_distinct(TextFunctions.shingleHashes(col("text"), 3)),
            lit(evalSh))),
        "source", Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0))
    val in = MemoryStream[(Long, String, String)]
    val q = stages(in.toDF().toDF("doc_id", "text", "source")
        .dropDuplicates("text"))
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try {
      // batches of 10 in id order: duplicate-chain members (10 apart) never
      // share a micro-batch, so first-arrival == min doc_id deterministically
      docs.grouped(10).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("curation_stream").select("doc_id")
        .as[Long].collect().sorted.toSeq
      // batch twin: the certified min-doc_id survivor rule (curatedDocs form)
      val quality = docsDf
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("quality") >= 0.2).drop("quality")
      val keep = quality.groupBy("text").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val batch = stages(quality.join(keep, Seq("doc_id"), "left_semi"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
      assert(!batch.exists(_ % 7 == 0), "eval members must be dropped")
      assert(!batch.exists(i => i % 10 == 9), "contaminated docs must be dropped")
      assert(!batch.exists(i => i % 10 == 6), "junk docs must be cut by quality")
      assert(!batch.exists(i => i % 10 == 3 && i > 10), "duplicates must lose to doc 3")
      assert(!batch.exists(_ % 3 == 2), "src2 stratum has mix rate 0")
    } finally q.stop()
  }

  test("dedupEvents drops duplicate event_ids within the watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventsStreaming.dedupEvents(in.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, t(10, 0), "click", 1.0), Ev(1, t(10, 1), "click", 1.0),
        Ev(2, t(10, 2), "view", 2.0), Ev(2, t(10, 2), "view", 2.0),
        Ev(3, t(10, 3), "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("mergeable sketches (KMV / freq-items / quantile) run unchanged as streaming aggs") {
    // The sketch aggregators are mergeable typed Aggregators, so Structured
    // Streaming can hold their buffers as aggregation state and fold each
    // micro-batch in — the SAME column definitions serve batch profiling
    // and live ingest. KMV and the quantile sample are deterministic at any
    // k (pure functions of the data), and freq-items is at its exact
    // operating point (capacity ≥ distinct tokens per group), so the final
    // streaming table must equal the batch aggregation EXACTLY.
    implicit val ctx = spark.sqlContext
    import graft.operators.Sketch
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(600) { i =>
      (s"g${i % 3}", (rnd.nextDouble() * 2147483647L).toLong,
        rnd.nextDouble() * 100, s"tok${i % 40}")
    }
    def sketchAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("grp")
      .agg(
        Sketch.kmvDistinct(16)(col("hv")).as("kmv"),
        Sketch.freqItems(64)(col("tok")).as("fi"),
        Sketch.quantileSketch(32)(col("hv"), col("v")).as("q"))
    val in = MemoryStream[(String, Long, Double, String)]
    val q = sketchAgg(in.toDF().toDF("grp", "hv", "v", "tok"))
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete").start()
    try {
      rows.grouped(150).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("sketch_stream")
        .collect().map(_.toString).sorted.toSeq
      val batch = sketchAgg(rows.toDF("grp", "hv", "v", "tok"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("Quality.audit runs unchanged as a streaming aggregation (live ingest gate)") {
    // The single-scan rule bundle is one aggregation, so Structured
    // Streaming holds its sums as state and the SAME rule definitions
    // gate a live ingest in complete mode; an FK rule is a stream-static
    // join + aggregate, equally streamable (as its own query — two
    // stateful aggregations can't share one streaming plan). Unique is
    // the documented boundary: count(DISTINCT) is unsupported in
    // streaming — at stream scale that check runs as a KMV estimate
    // (Sketch.kmvDistinct), not an exact count.
    implicit val ctx = spark.sqlContext
    import graft.operators.Quality
    import graft.operators.Quality._
    val rows = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 5.0, "a"), (2L, -1.0, "b"), (3L, 3.0, "zz"),
      (null, 2.0, "a"), (9L, null, null))
    val localRules = Seq(NotNull("id"),
      Range("v", lo = Some(0.0), hi = Some(4.0)), InSet("cat", Seq("a", "b")))
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val fkRule = Seq(ForeignKey("id", parent, "parent", "pid"))

    val in = MemoryStream[(java.lang.Long, java.lang.Double, String)]
    val stream = in.toDF().toDF("id", "v", "cat")
    val qLocal = Quality.audit(stream, localRules)
      .writeStream.format("memory").queryName("quality_stream")
      .outputMode("complete").start()
    val qFk = Quality.audit(stream, fkRule)
      .writeStream.format("memory").queryName("quality_fk_stream")
      .outputMode("complete").start()
    try {
      rows.grouped(2).foreach { b =>
        in.addData(b: _*)
        qLocal.processAllAvailable(); qFk.processAllAvailable()
      }
      val streamed = spark.table("quality_stream")
        .unionAll(spark.table("quality_fk_stream"))
        .collect().map(_.toString).sorted.toSeq
      val batch = Quality.audit(rows.toDF("id", "v", "cat"), localRules)
        .unionAll(Quality.audit(rows.toDF("id", "v", "cat"), fkRule))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
      assert(streamed.size == 4)
    } finally { qLocal.stop(); qFk.stop() }
  }

  test("transitions: out-of-order delivery, watermark finality, carried-last bridge") {
    implicit val ctx = spark.sqlContext
    def usOf(ts: Timestamp) = ts.getTime * 1000L
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventsStreaming.transitions(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    try {
      // batch 1: the MIDDLE and LAST events arrive first; the first is
      // still in flight — nothing may be emitted yet (a pair emitted now
      // would be wrong once 10:00 lands)
      in.addData((1L, t(10, 30), 2L, "click"), (1L, t(11, 0), 3L, "buy"))
      q.processAllAvailable()
      assert(spark.table("trans_stream").isEmpty)
      // batch 2: the 10:00 event arrives OUT OF ORDER (inside the 2h
      // horizon); batch 3 advances the watermark past 11:00 and the
      // timeout flushes the finalized prefix in (us, id) order
      in.addData((1L, t(10, 0), 1L, "view"))
      q.processAllAvailable()
      in.addData((99L, t(14, 0), 999L, "x"))
      q.processAllAvailable()
      in.addData((99L, t(14, 1), 998L, "x"))
      q.processAllAvailable()
      val afterFlush = spark.table("trans_stream")
        .as[TransitionOut].collect().filter(_.user_id != 99L).toSet
      assert(afterFlush == Set(
        TransitionOut(1L, "view", "click", usOf(t(10, 0)), usOf(t(10, 30))),
        TransitionOut(1L, "click", "buy", usOf(t(10, 30)), usOf(t(11, 0)))))
      // batch 4: a later event bridges off the CARRIED last (buy), which
      // left the buffer when it finalized
      in.addData((1L, t(12, 30), 4L, "error"))
      q.processAllAvailable()
      in.addData((99L, t(16, 0), 997L, "x"))
      q.processAllAvailable()
      in.addData((99L, t(16, 1), 996L, "x"))
      q.processAllAvailable()
      val got = spark.table("trans_stream")
        .as[TransitionOut].collect().filter(_.user_id != 99L).toSet
      assert(got == afterFlush +
        TransitionOut(1L, "buy", "error", usOf(t(11, 0)), usOf(t(12, 30))))
    } finally q.stop()
  }

  test("transitions pair multiset equals the batch Markov input on randomized out-of-order streams") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(13)
    val types = Seq("view", "click", "buy", "error")
    val events = (1 to 120).map { i =>
      (rnd.nextInt(5).toLong + 1L, t(9 + rnd.nextInt(4), rnd.nextInt(60)),
        i.toLong, types(rnd.nextInt(4)))
    }
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventsStreaming.transitions(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("trans_rand")
      .outputMode("append").start()
    try {
      // near-ordered delivery (the asofJoin random-test shape): slices
      // advance in time so the 1-minute watermark drops nothing, while
      // each slice is internally SHUFFLED for out-of-order arrival
      events.sortBy(_._2.getTime).grouped(40).foreach { b =>
        in.addData(rnd.shuffle(b): _*); q.processAllAvailable()
      }
      // two sentinel advances: the first moves the watermark past every
      // event, the second fires the flush timeouts it armed
      in.addData((99L, t(20, 0), 999L, "x")); q.processAllAvailable()
      in.addData((99L, t(20, 1), 998L, "x")); q.processAllAvailable()
      val streamed = spark.table("trans_rand")
        .as[TransitionOut].collect().filter(_.user_id != 99L)
        .groupBy(o => (o.from_type, o.to_type)).map { case (k, v) => k -> v.size.toLong }
      val batch = graft.operators.Markov.transitions(
          events.toDF("user_id", "ts", "event_id", "event_type")
            .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type"),
          key = "user_id", time = "us", typ = "event_type",
          tieBreak = "event_id")
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("funnelSteps: windowed first-touch, out-of-window stall, out-of-order finality") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    // 30-minute step window
    val q = EventsStreaming.funnelSteps(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        steps = Seq("view", "click", "purchase"),
        windowUnits = 30L * 60L * 1000000L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("funnel_steps")
      .outputMode("append").start()
    def us(h: Int, m: Int) = t(h, m).getTime * 1000L
    try {
      in.addData(
        // user 1: full conversion; the click at 9:50 arrives BEFORE the
        // view in this batch (out of order) but must fold after it
        (1L, t(9, 50), 3L, "click"), (1L, t(9, 40), 2L, "view"),
        (1L, t(10, 10), 4L, "purchase"),
        // user 2: clicks 40 min after the first view — outside the
        // window, stalls at step 1 (the later view must NOT re-seed)
        (2L, t(9, 0), 10L, "view"), (2L, t(9, 40), 11L, "click"),
        (2L, t(9, 45), 12L, "view"),
        // user 3: purchase before any view neither helps nor blocks
        (3L, t(9, 0), 20L, "purchase"), (3L, t(9, 30), 21L, "view"))
      q.processAllAvailable()
      // sentinel advances: move the watermark past everything, then fire
      // the buffered-flush timeouts it armed
      in.addData((99L, t(12, 0), 998L, "x")); q.processAllAvailable()
      in.addData((99L, t(12, 1), 999L, "x")); q.processAllAvailable()
      val got = spark.table("funnel_steps").as[FunnelStepOut].collect()
        .filter(_.user_id != 99L).map(o => (o.user_id, o.step, o.t_us)).toSet
      assert(got == Set(
        (1L, 1, us(9, 40)), (1L, 2, us(9, 50)), (1L, 3, us(10, 10)),
        (2L, 1, us(9, 0)),
        (3L, 1, us(9, 30))))
    } finally q.stop()
  }

  test("funnelSteps equals the batch Funnel cascade on randomized out-of-order streams") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val types = Seq("view", "click", "purchase", "error")
    val steps = Seq("view", "click", "purchase")
    val events = (1 to 150).map { i =>
      (rnd.nextInt(8).toLong + 1L, t(9 + rnd.nextInt(4), rnd.nextInt(60)),
        i.toLong, types(rnd.nextInt(4)))
    }
    val win = 45L * 60L * 1000000L
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventsStreaming.funnelSteps(
        in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
        steps = steps, windowUnits = win, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("funnel_rand")
      .outputMode("append").start()
    try {
      // near-ordered delivery (the transitions random-test shape): slices
      // advance in time so the 1-minute watermark drops nothing, while
      // each slice is internally SHUFFLED for out-of-order arrival
      events.sortBy(_._2.getTime).grouped(50).foreach { b =>
        in.addData(rnd.shuffle(b): _*); q.processAllAvailable()
      }
      in.addData((99L, t(20, 0), 998L, "error")); q.processAllAvailable()
      in.addData((99L, t(20, 1), 999L, "error")); q.processAllAvailable()
      val streamed = spark.table("funnel_rand").as[FunnelStepOut].collect()
        .filter(_.user_id != 99L).map(o => (o.user_id, o.step, o.t_us)).toSet
      // batch twin: Funnel.stepTimes' per-step (user, t) frames
      val batch = graft.operators.Funnel.stepTimes(
          events.toDF("user_id", "ts", "event_id", "event_type")
            .selectExpr("user_id", "unix_micros(ts) AS us", "event_type"),
          key = "user_id", time = "us", typ = "event_type",
          steps = steps, windowUnits = win)
        .zipWithIndex.flatMap { case (df, i) =>
          df.as[(Long, Long)].collect().map { case (u, tu) => (u, i + 1, tu) }
        }.toSet
      graft.operators.Caches.releaseAll()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("retentionCells: cohort finality, per-cell dedupe, out-of-order arrival") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    // hour buckets, 2-hour periods — small units so one synthetic day
    // exercises several periods
    val q = EventsStreaming.retentionCells(
        in.toDF().toDF("user_id", "ts"),
        unitsPerBucket = 3600000000L, bucketsPerPeriod = 2,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ret_cells")
      .outputMode("append").start()
    try {
      in.addData(
        // user 1: cohort bucket 1; buckets 1,2 → offset 0 (one row),
        // buckets 5,5 → offset 2 (one row, second event no re-emit)
        (1L, t(1, 30)), (1L, t(2, 10)), (1L, t(5, 0)), (1L, t(5, 30)),
        // user 2: OUT OF ORDER in one batch — the 3:00 event is listed
        // before the 2:00 one, but the cohort must be bucket 2
        (2L, t(3, 0)), (2L, t(2, 0)))
      q.processAllAvailable()
      // sentinel advances: watermark past everything, then fire timeouts
      in.addData((99L, t(20, 0))); q.processAllAvailable()
      in.addData((99L, t(20, 1))); q.processAllAvailable()
      val got = spark.table("ret_cells").as[RetentionCellOut].collect()
        .filter(_.user_id != 99L)
        .map(o => (o.user_id, o.cohort_period, o.period_offset)).toSet
      // cohort periods are ABSOLUTE epoch 2-hour indexes (the batch
      // operator's convention), so derive them from the instants
      def per(ts: Timestamp) =
        Math.floorDiv(Math.floorDiv(ts.getTime * 1000L, 3600000000L), 2L)
      assert(got == Set(
        (1L, per(t(1, 30)), 0L), (1L, per(t(1, 30)), 2L),
        (2L, per(t(2, 0)), 0L)))
      assert(per(t(2, 0)) == per(t(1, 30)) + 1L)
    } finally q.stop()
  }

  test("retentionCells grid equals batch Cohort.retention on randomized out-of-order streams") {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val events = (1 to 200).map { _ =>
      (rnd.nextInt(10).toLong + 1L, t(rnd.nextInt(20), rnd.nextInt(60)))
    }
    val in = MemoryStream[(Long, Timestamp)]
    val q = EventsStreaming.retentionCells(
        in.toDF().toDF("user_id", "ts"),
        unitsPerBucket = 3600000000L, bucketsPerPeriod = 2,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("ret_rand")
      .outputMode("append").start()
    try {
      // near-ordered delivery (the funnel/transitions random-test shape)
      events.sortBy(_._2.getTime).grouped(50).foreach { b =>
        in.addData(rnd.shuffle(b): _*); q.processAllAvailable()
      }
      in.addData((99L, t(23, 0))); q.processAllAvailable()
      in.addData((99L, t(23, 1))); q.processAllAvailable()
      val cells = spark.table("ret_rand").as[RetentionCellOut].collect()
        .filter(_.user_id != 99L)
      // append-mode exactness: each (user, cell) at most once
      assert(cells.length ==
        cells.map(o => (o.user_id, o.cohort_period, o.period_offset))
          .toSet.size)
      val streamedGrid = cells
        .groupBy(o => (o.cohort_period, o.period_offset))
        .map { case (k, v) => k -> v.length.toLong }
      val batch = graft.operators.Cohort.retention(
          events.toDF("user_id", "ts")
            .selectExpr("user_id", "unix_micros(ts) AS us"),
          key = "user_id", time = "us",
          unitsPerBucket = 3600000000L, bucketsPerPeriod = 2)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamedGrid == batch)
    } finally q.stop()
  }
}
