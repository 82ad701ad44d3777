package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
