package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

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

  test("hourlyByType batch/streaming parity: same transform on a static frame") {
    val batch = Seq(
      Ev(1, t(10, 5), "click", 1.0), Ev(2, t(10, 40), "click", 2.0),
      Ev(3, t(11, 1), "view", 4.0)).toDF()
    val got = EventsStreaming.hourlyByType(batch)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(got == Set((t(10, 0), "click", 2L, 3.0), (t(11, 0), "view", 1L, 4.0)))
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
}
