package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state for [[EventsStreaming.sessionize]]. */
case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

/** One closed session. */
case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long,
    duration_us: Long)

/**
 * Structured Streaming tier. The reference is strictly batch (SURVEY.md
 * §2.10 — finite input, full barrier before results), so everything here is
 * extension: the same logical aggregations as the batch query surface,
 * expressed over an unbounded source with watermarked event time.
 *
 * The transformations are source-agnostic `DataFrame => DataFrame` so one
 * definition serves `spark.read` (batch backfill) and `spark.readStream`
 * (live) — the Structured Streaming contract that makes a lambda
 * architecture unnecessary. Tested end-to-end over `MemoryStream` in
 * `StreamingSpec`.
 */
object EventsStreaming {

  /**
   * Streaming twin of the batch `events_window` query: tumbling one-hour
   * event-time windows per event_type. With a watermark, state for windows
   * older than the watermark is dropped — bounded state at any scale.
   * In append mode a window emits once, when the watermark passes its end.
   */
  def hourlyByType(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("cnt"),
        col("sum_value"))

  /**
   * Streaming dedup by event_id within the watermark horizon —
   * `dropDuplicates` keyed on (event_id) with event-time bound so the
   * seen-keys state cannot grow without bound (the streaming analogue of the
   * batch exact-dedup operator).
   */
  def dedupEvents(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /**
   * Streaming CONTENT dedup: drop rows whose `textCol` payload was already
   * seen inside the watermark horizon. Keyed on (xxhash64, 31-bit rolling
   * fingerprint, exact length) — ~95 independent bits, so a false-positive
   * drop needs a three-way collision (birthday bound ≪ 2^-40 even at
   * billions of in-window documents). State per key is ~24 bytes regardless
   * of document size, which is what keeps dedup state bounded when the
   * stream carries full documents.
   *
   * NOTE: probabilistic by design, unlike batch `Dedup.exactByFingerprint`
   * (which verifies group-locally on the text). Exact streaming dedup would
   * have to hold full payloads in state — key on the text column directly
   * if that tradeoff is wanted.
   */
  def dedupByContent(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp_x", xxhash64(col(textCol)))
      .withColumn("fp_p", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withColumn("fp_len", length(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp_x", "fp_p", "fp_len")
      .drop("fp_x", "fp_p", "fp_len")

  /**
   * Streaming NEAR-dup dedup at the signature-identical operating point:
   * drop rows whose 62-bit shingle-SimHash equals one seen inside the
   * watermark horizon. The signature is computed PER ROW by the native
   * [[graft.expressions.SimhashFromHashes]] over
   * [[graft.expressions.ShingleHashes]] — no aggregation enters the
   * streaming plan, and state is 8 bytes per distinct in-window signature
   * regardless of document size.
   *
   * Scope, stated honestly: this catches near-duplicates whose votes agree
   * on every bit — reorderings, whitespace/formatting variants, and edits
   * too small to flip any bit-majority — i.e. the boilerplate mass a crawl
   * stream actually carries. It does NOT catch hamming > 0 pairs: a
   * radius-h streaming detector needs band-keyed state in `bands` parallel
   * stateful operators plus a cross-band merge, whose once-per-doc emission
   * semantics are not expressible with bounded state in one pass. Batch
   * [[graft.operators.Dedup.simhashPairs]] (same signature function,
   * asserted in TextFunctionsSpec) is the radius-h engine; run it over the
   * stream's sink for periodic compaction.
   */
  def dedupBySimhash(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", k: Int = 3,
      watermarkDelay: String = "2 hours"): DataFrame = {
    import graft.functions.TextFunctions.{shingleHashes, simhashSig}
    docs
      .withColumn("_simhash", simhashSig(shingleHashes(col(textCol), k)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_simhash")
      .drop("_simhash")
  }

  /**
   * Streaming sessionization — the custom-state tier the built-in operators
   * can't express: per-user sessions split at `gapMinutes` of event-time
   * silence, held open in `GroupState` and closed either by a later event
   * beyond the gap or by an EVENT-TIME TIMEOUT once the watermark passes
   * the open session's horizon (so state is bounded and sessions still
   * emit for users who simply stop). Batch twin: the `events_sessions`
   * query (same gap rule via lag/running-sum windows); agreement on a
   * closed stream is asserted in StreamingSpec.
   *
   * Emits a [[SessionOut]] row per CLOSED session, append-mode.
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      // the watermarked ts column must remain in the input schema for the
      // event-time timeout to be allowed
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's gap horizon: close it
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, s.startUs, s.nEvents, s.lastUs - s.startUs))
          } else {
            val sorted = rows.map(_._3).toArray.sorted
            // fold events into (closed sessions, open session)
            var open = state.getOption
            val out = Seq.newBuilder[SessionOut]
            for (us <- sorted) {
              open match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  open = Some(s.copy(lastUs = us, nEvents = s.nEvents + 1))
                case Some(s) =>
                  out += SessionOut(userId, s.startUs, s.nEvents, s.lastUs - s.startUs)
                  open = Some(SessionState(us, us, 1L))
                case None =>
                  open = Some(SessionState(us, us, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // Close via timeout when the watermark passes last event + gap.
              // CLAMPED to watermark+1, defensively: the operator filters
              // input rows behind the current watermark before this function
              // sees them (asserted in StreamingSpec), so lastUs + gap
              // normally exceeds the watermark — but setTimeoutTimestamp
              // THROWS (killing the whole query) if it ever isn't, and the
              // boundary case (row exactly at the watermark, state restored
              // from a prior run) is cheap to guard against.
              state.setTimeoutTimestamp(
                math.max((s.lastUs + gapUs) / 1000L,
                  state.getCurrentWatermarkMs() + 1L)) // ms
            }
            out.result().iterator
          }
      }
  }
}
