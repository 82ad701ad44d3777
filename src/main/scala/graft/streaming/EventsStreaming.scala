package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state for [[EventsStreaming.sessionize]]. */
case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

/** A buffered right-side (reference) row for [[EventsStreaming.asofJoin]]. */
case class AsofRightRow(us: Long, value: Double)

/** A buffered left-side (event) row awaiting its watermark-final answer. */
case class AsofLeftRow(leftId: Long, us: Long)

/** Per-key state for [[EventsStreaming.asofJoin]]: the carried last-known
  * right value at-or-before the watermark (16 bytes — the "last-value
  * carry"), plus the above-watermark buffers the watermark horizon bounds. */
case class AsofJoinState(hasCarry: Boolean, carryUs: Long, carryValue: Double,
    rights: List[AsofRightRow], lefts: List[AsofLeftRow])

/** One enriched left row: `asof_value` is the latest right value with
  * `right.us <= ts_us` (None when no right row precedes it). */
case class AsofOut(left_id: Long, key: Long, ts_us: Long,
    asof_value: Option[Double])

/** One closed session. */
case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long,
    duration_us: Long)

/** A buffered event awaiting watermark finality in
  * [[EventsStreaming.transitions]]. */
case class TransEvent(us: Long, eventId: Long, ty: String)

/** Per-user state for [[EventsStreaming.transitions]]: the last FINALIZED
  * event (the bridge into the next batch of the sequence — fixed size per
  * key), plus the above-watermark buffer the horizon bounds. */
case class TransState(hasLast: Boolean, lastUs: Long, lastId: Long,
    lastTy: String, buffer: List[TransEvent])

/** One finalized consecutive-event transition. */
case class TransitionOut(user_id: Long, from_type: String, to_type: String,
    from_us: Long, to_us: Long)

/** A buffered event awaiting watermark finality in
  * [[EventsStreaming.funnelSteps]]. */
case class FunnelEvent(us: Long, eventId: Long, ty: String)

/** Per-user state for [[EventsStreaming.funnelSteps]]: the min-time carry
  * — `reached(i)` is the FINAL first-touch time of step i+1 (at most
  * |steps| longs, fixed size per key), plus the above-watermark buffer
  * the horizon bounds (dropped entirely once the funnel completes). */
case class FunnelState(reached: List[Long], buffer: List[FunnelEvent])

/** One finalized funnel step reach: this user reached `step` (1-based)
  * at `t_us`. */
case class FunnelStepOut(user_id: Long, step: Int, t_us: Long)

/** Per-user state for [[EventsStreaming.retentionCells]]: the FINAL
  * cohort bucket (min-time carry — one long, fixed once the first event
  * finalizes), the period offsets already emitted (bounded by the user's
  * distinct active periods), plus the above-watermark event-time buffer
  * the horizon bounds. */
case class RetentionState(hasCohort: Boolean, cohortBucket: Long,
    emitted: List[Long], buffer: List[Long])

/** One watermark-final retention cell reach: `user_id` was active
  * `period_offset` periods after their `cohort_period`. */
case class RetentionCellOut(user_id: Long, cohort_period: Long,
    period_offset: Long)

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

  /** Hopping (sliding) twin of [[hourlyByType]]: 1-hour windows every
    * `slide` — each event lands in duration/slide windows. Same transform
    * serves batch (`events_hopping`, oracle-checked) and streaming; the
    * overlapping-window state is just more groups, nothing new for the
    * streaming engine. */
  def hoppingByType(
      events: DataFrame,
      slide: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("cnt"),
        col("sum_value"))

  /**
   * Streaming EXACT windowed distinct-user counts — the dedup-then-
   * aggregate composition: `dropDuplicates` on (user_id, hour-window
   * start) bounds state to one row per distinct (user, window) inside the
   * watermark horizon, then the watermarked windowed count aggregates the
   * deduplicated stream. This is the EXACT form of COUNT(DISTINCT) in
   * streaming (which Structured Streaming rejects as a direct aggregate):
   * two stateful stages, both watermark-bounded, emitting once per window
   * in append mode. The batch twin is one `groupBy(window).agg(
   * countDistinct)` — StreamingSpec asserts equality.
   *
   * Note the plain `dropDuplicates` (not WithinWatermark): the dedup key
   * CONTAINS the window start, and the watermark on `ts` already evicts
   * whole windows' key state — the WithinWatermark variant would key
   * eviction on the row's own event time, the same horizon here.
   */
  def hourlyDistinctUsers(events: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("user_id"),
        window(col("ts"), "1 hour").as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("w.start").as("hour_start"), col("n_users"))

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

  /** The accepted-corpus signature table [[dedupIncrementalBySimhash]]
    * anti-joins against: one row per DISTINCT 62-bit shingle-SimHash of
    * the base corpus — |distinct signatures| × 8 bytes, never the texts.
    * Built batch-side once per ingest epoch (the corpus is immutable
    * within one); the SAME signature expression as [[dedupBySimhash]]
    * and the batch `dedup_simhash` row, so the three faces share one
    * certified operating point. */
  def simhashSignatures(base: DataFrame, textCol: String = "text",
      k: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.{shingleHashes, simhashSig}
    // the shingle size is TAGGED into the column name: a base table built
    // at k=4 anti-joined by an ingest stream hashing at k=3 has disjoint
    // signature spaces and silently admits EVERY duplicate — the name
    // check in dedupIncrementalBySimhash turns that mismatch into a loud
    // construction-time failure instead
    base.select(simhashSig(shingleHashes(col(textCol), k))
        .as(s"_simhash_k$k"))
      .distinct()
  }

  /**
   * STREAMING INCREMENTAL INGEST DEDUP — the watermark-finalized twin of
   * the batch [[graft.operators.Dedup.incrementalNearDup]] row
   * (`dedup_incremental`) at the signature-identical operating point: a
   * stream of candidate documents is admitted iff
   *
   *  (a) its signature is absent from the STATIC accepted-corpus
   *      signature table — a stream-static LEFT ANTI join, stateless on
   *      the stream side (the base is immutable: a new copy of existing
   *      content never displaces it, the batch row's has-base drop rule);
   *  (b) no earlier in-horizon stream doc carried the same signature —
   *      `dropDuplicatesWithinWatermark`, 8 bytes of state per distinct
   *      in-window signature (the batch row's pure-batch survivor rule;
   *      batch keeps the MIN-ID member where the stream keeps the FIRST
   *      ARRIVAL — identical whenever event time follows id, the closed-
   *      stream law StreamingSpec pins against the real
   *      `incrementalNearDup` on exact-copy corpora).
   *
   * Scope, honestly ([[dedupBySimhash]]'s caveat): signature-identical
   * catches reorderings/formatting variants/sub-bit-flip edits, not
   * hamming > 0 pairs — the batch row at its Jaccard threshold is the
   * radius-h engine; run it over the sink for periodic compaction. At
   * 100 TB the static side is a signature TABLE (bytes per accepted doc):
   * broadcast when small, shuffled equi-join when not — either way the
   * stream never rescans accepted texts, the property that makes
   * continuous ingest dedup viable at all.
   */
  def dedupIncrementalBySimhash(docs: DataFrame, baseSigs: DataFrame,
      tsCol: String = "ts", textCol: String = "text", k: Int = 3,
      watermarkDelay: String = "2 hours"): DataFrame = {
    import graft.functions.TextFunctions.{shingleHashes, simhashSig}
    val sigCol = s"_simhash_k$k"
    // the k-tagged column name ([[simhashSignatures]]) is the coupling
    // check: a signature table hashed at a different shingle size would
    // otherwise anti-join against a disjoint signature space and admit
    // every duplicate — fail construction loudly instead
    require(baseSigs.columns.sameElements(Array(sigCol)),
      s"baseSigs must be simhashSignatures(base, k = $k) — expected one " +
        s"column '$sigCol', got [${baseSigs.columns.mkString(", ")}]")
    docs
      .withColumn(sigCol, simhashSig(shingleHashes(col(textCol), k)))
      .withWatermark(tsCol, watermarkDelay)
      .join(baseSigs, Seq(sigCol), "left_anti")
      .dropDuplicatesWithinWatermark(sigCol)
      .drop(sigCol)
  }

  /**
   * STREAMING IVF INDEX MAINTENANCE, ingest half — new embeddings arrive
   * on a stream and are assigned to an EXISTING index's cells by the
   * IDENTICAL plan-constant argmin expression the batch tier certified
   * ([[graft.operators.Similarity.assignCells]], `kmeans_assign` oracle):
   * a STATELESS per-row map, so the output appends straight onto the
   * index's assignment table with no watermark and no state — exactly
   * the shape that keeps an ANN index's coverage fresh between retrains.
   * The batch build-once stance stands at 100 TB: the stream maintains
   * the ASSIGNMENT, never the centroids (centroid drift is detected by
   * [[ivfIngestCellCounts]] and answered by a batch refit —
   * `buildIvfIndex`/`lloydCentroidsTrained`).
   *
   * Output: every input column plus `cell`. StreamingSpec pins the
   * closed-stream law: streaming assignment ≡ batch `assignCells` on the
   * same rows, any arrival order (per-row purity makes it exact).
   */
  def ivfIngestAssign(vecs: DataFrame,
      centroids: Seq[Seq[Double]],
      embCol: String = "embedding"): DataFrame =
    vecs.withColumn("cell",
      graft.operators.Similarity.cellColumn(col(embCol), centroids))

  /**
   * The DRIFT SIGNAL for [[ivfIngestAssign]]: watermark-final ingest
   * counts per (event-time window, cell). A coarse quantizer fitted on
   * yesterday's distribution shows up here as a shifting cell histogram —
   * the operational trigger for a batch refit — and the counts double as
   * per-cell probe-cost telemetry (a cell absorbing most ingest is the
   * one IVF probes will be slowest on). State: one count per in-horizon
   * (window, cell) — nCells × windows, independent of stream volume.
   *
   * StreamingSpec pins the closed-stream law against the batch
   * `assignCells` + window/count aggregation on a randomized
   * out-of-order stream.
   */
  def ivfIngestCellCounts(vecs: DataFrame, centroids: Seq[Seq[Double]],
      tsCol: String = "ts", embCol: String = "embedding",
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    ivfIngestAssign(vecs, centroids, embCol)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col("cell"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("cell"), col("n"))

  /**
   * Streaming twin of the batch point-in-time join
   * ([[graft.operators.AsOf.asofJoin]], the `events_asof` query): every left
   * row is enriched with the LATEST right row of the same key with
   * `right.ts <= left.ts` (inclusive), exact within the watermark horizon.
   *
   * Shape: both streams are tagged and unioned (the global watermark is the
   * min over the two sources), keyed by the join key, and resolved in ONE
   * `flatMapGroupsWithState` operator:
   *
   *  - a left row cannot be answered on arrival — an older right row may
   *    still be in flight — so lefts buffer in state until the watermark
   *    passes their event time, at which point every right row at-or-before
   *    them has either arrived or been dropped as late (the same finality
   *    contract every watermarked operator gives);
   *  - right rows at-or-before the watermark collapse into a single carried
   *    (ts, value) pair — the streaming analogue of the batch operator's
   *    `last(..., ignoreNulls)` running carry — so steady-state size is 16
   *    bytes per key plus only the in-horizon buffers;
   *  - an EVENT-TIME TIMEOUT re-invokes keys with buffered lefts when the
   *    watermark advances without new rows for the key, so answers flush
   *    even for keys whose streams go quiet.
   *
   * Emission finality uses STRICT `left.us < watermark` (a right row exactly
   * AT the watermark can still legally arrive; one past it cannot).
   * Batch caller contract mirrored from [[graft.operators.AsOf.asofJoin]]:
   * `right` unique per (key, ts) — at duplicate (key, ts) the max value wins,
   * deterministically; null payloads are not representable (cast to double).
   * Agreement with the batch operator on closed streams — including
   * out-of-order delivery — is asserted in StreamingSpec.
   *
   * `left` needs (keyCol, tsCol, leftIdCol); `right` needs (keyCol, tsCol,
   * payloadCol). Emits [[AsofOut]] per left row, append-mode, once final.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, leftIdCol: String, payloadCol: String,
      watermarkDelay: String = "2 hours"): Dataset[AsofOut] = {
    val spark = left.sparkSession
    import spark.implicits._
    // the watermarked ts column must survive the select for the event-time
    // timeout to be allowed (same constraint as sessionize)
    val l = left.withWatermark(tsCol, watermarkDelay).select(
      col(keyCol).cast("long").as("key"), unix_micros(col(tsCol)).as("us"),
      lit(1).as("side"), col(leftIdCol).cast("long").as("left_id"),
      lit(0.0).as("payload"), col(tsCol).as("ts"))
    val r = right.withWatermark(tsCol, watermarkDelay).select(
      col(keyCol).cast("long").as("key"), unix_micros(col(tsCol)).as("us"),
      lit(2).as("side"), lit(-1L).as("left_id"),
      col(payloadCol).cast("double").as("payload"), col(tsCol).as("ts"))
    l.unionByName(r)
      .as[(Long, Long, Int, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofJoinState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, rows, state: GroupState[AsofJoinState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption
            .getOrElse(AsofJoinState(false, 0L, 0.0, Nil, Nil))
          if (!state.hasTimedOut) {
            val rs = List.newBuilder[AsofRightRow]
            val ls = List.newBuilder[AsofLeftRow]
            rows.foreach { case (_, us, side, leftId, payload, _) =>
              if (side == 2) rs += AsofRightRow(us, payload)
              else ls += AsofLeftRow(leftId, us)
            }
            st = st.copy(rights = st.rights ++ rs.result(),
              lefts = st.lefts ++ ls.result())
          }
          // all known rights, ascending (us, value): for any target ts the
          // LAST element at-or-before it is the answer (max value wins at
          // duplicate ts — see the uniqueness contract above)
          val allRights =
            (if (st.hasCarry) List(AsofRightRow(st.carryUs, st.carryValue))
             else Nil) ++ st.rights.sortBy(rr => (rr.us, rr.value))
          val (emit, keepLefts) = st.lefts.partition(_.us < wmUs)
          val out = emit.sortBy(lr => (lr.us, lr.leftId)).map { lr =>
            val best = allRights.foldLeft(Option.empty[AsofRightRow]) {
              (acc, rr) => if (rr.us <= lr.us) Some(rr) else acc
            }
            AsofOut(lr.leftId, key, lr.us, best.map(_.value))
          }
          // rights strictly behind the watermark collapse into the carry
          // (no future emittable left can sit before them)
          val (settled, keepRights) =
            st.rights.sortBy(rr => (rr.us, rr.value)).partition(_.us < wmUs)
          val carry = (settled.lastOption, st.hasCarry) match {
            case (Some(rr), false) => Some(rr)
            case (Some(rr), true) =>
              Some(if (rr.us >= st.carryUs) rr
                   else AsofRightRow(st.carryUs, st.carryValue))
            case (None, true) => Some(AsofRightRow(st.carryUs, st.carryValue))
            case (None, false) => None
          }
          val ns = AsofJoinState(carry.isDefined,
            carry.map(_.us).getOrElse(0L), carry.map(_.value).getOrElse(0.0),
            keepRights, keepLefts)
          if (!ns.hasCarry && ns.rights.isEmpty && ns.lefts.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(ns)
            // only buffered lefts need a watermark-advance wake-up; a bare
            // carry (or above-watermark rights) waits for new input
            if (ns.lefts.nonEmpty)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          }
          out.iterator
      }
  }

  /**
   * Watermarked STREAM-STREAM INTERVAL JOIN — the streaming twin of the
   * batch `events_attribution` pair set, and the one streaming join class
   * the tier didn't yet exercise (asofJoin is custom
   * flatMapGroupsWithState state; THIS is Spark's built-in two-sided
   * join-state machinery, which the preference order says to reach for
   * first). Each purchase meets every click of the same user inside the
   * event-time lookback (tc ≤ tp, tp − tc < lookback): the range
   * condition plus both sides' watermarks is exactly what lets Spark
   * bound the join state — a click older than (watermark − lookback) can
   * never match a future purchase and its buffered state is dropped;
   * without the time bound a stream-stream inner join would buffer both
   * streams forever.
   *
   * Inputs are event-shaped frames (event_id, user_id, ts [, value]).
   * Output: one row per qualifying (purchase, click) pair with µs times —
   * the same pair-set contract as the batch row (credit division is a
   * downstream fold). Source-agnostic: on batch frames `withWatermark` is
   * a no-op and the join is the plain interval join, so batch ≡ streaming
   * is asserted directly in StreamingSpec.
   */
  def attributionPairs(purchases: DataFrame, clicks: DataFrame,
      lookback: String = "24 hours",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", watermarkDelay)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") > col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        unix_micros(col("p_ts")).as("tp_us"),
        unix_micros(col("c_ts")).as("tc_us"), col("value"))
  }

  /**
   * The BUILT-IN sibling of [[sessionize]]: Spark's native
   * `session_window` gap aggregation — no custom state, the merging
   * session windows live in the aggregation operator's state store, and
   * any aggregate composes per session (the preference-order-first
   * spelling; [[sessionize]] remains the custom-state tier for outputs an
   * aggregation can't shape, e.g. per-session event sequences).
   *
   * GAP ALIGNMENT, deliberate: the batch rule (`events_sessions`) and
   * [[sessionize]] SPLIT on strictly-greater-than-gap — an event exactly
   * `gap` after its predecessor stays in the session. `session_window`
   * merges on `ts < window.end = last + gap` (exactly-gap SPLITS). The
   * built-in gap is therefore `gap + 1 µs`, making the two rules
   * identical on µs-granularity event time (StreamingSpec pins the
   * exact-gap boundary).
   *
   * Output shape = [[SessionOut]]'s columns; `duration_us` is
   * last-event − start (window.end would add the gap).
   */
  def sessionizeBuiltin(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val gapUsPlus = gapMinutes.toLong * 60L * 1000000L + 1L
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapUsPlus microseconds"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"),
        (unix_micros(col("last_ts")) -
          unix_micros(col("session_window.start"))).as("duration_us"))
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

  /**
   * Streaming twin of the batch transition matrix ([[graft.operators
   * .Markov.transitions]] / the `events_markov` query): emits one row per
   * FINALIZED consecutive-event pair per user, append-mode. Downstream a
   * plain streaming `groupBy(from_type, to_type).count()` maintains the
   * live transition counts.
   *
   * Ordering under out-of-order delivery is the asofJoin finality
   * argument: a pair (a → b) may only be emitted once NO event can still
   * arrive between a and b — i.e. once the watermark passes b (strict
   * `us < watermark`; an event exactly AT the watermark can still legally
   * arrive). So events buffer in state until final, then the finalized
   * prefix — sorted by the same unique (us, event_id) order the batch
   * operator uses — emits its consecutive pairs, and the LAST finalized
   * event is carried as the bridge into the next batch (fixed-size per
   * key, the asofJoin carry pattern). Buffer size is bounded by the
   * watermark horizon; an EVENT-TIME TIMEOUT flushes buffered events for
   * users whose streams go quiet. On a closed stream the emitted pair
   * multiset equals the batch operator's input pairs exactly
   * (StreamingSpec asserts this on randomized out-of-order streams).
   *
   * `events` needs (userCol, tsCol, idCol, typeCol).
   */
  def transitions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type",
      watermarkDelay: String = "2 hours"): Dataset[TransitionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked ts column must survive the select for the
    // event-time timeout to be allowed (same constraint as sessionize)
    events.withWatermark(tsCol, watermarkDelay)
      .select(col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).cast("string").as("ty"), col(tsCol).as("ts"))
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TransState, TransitionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[TransState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption
            .getOrElse(TransState(false, 0L, 0L, "", Nil))
          if (!state.hasTimedOut) {
            val add = rows.map(r => TransEvent(r._2, r._3, r._4)).toList
            st = st.copy(buffer = st.buffer ++ add)
          }
          val (fin, keep) = st.buffer.partition(_.us < wmUs)
          val ordered = fin.sortBy(e => (e.us, e.eventId))
          val seq0 =
            (if (st.hasLast) List(TransEvent(st.lastUs, st.lastId, st.lastTy))
             else Nil) ++ ordered
          val out = seq0.zip(seq0.drop(1)).map { case (a, b) =>
            TransitionOut(userId, a.ty, b.ty, a.us, b.us)
          }
          val last = ordered.lastOption.map(e => (e.us, e.eventId, e.ty))
            .orElse(if (st.hasLast) Some((st.lastUs, st.lastId, st.lastTy))
                    else None)
          val ns = TransState(last.isDefined,
            last.map(_._1).getOrElse(0L), last.map(_._2).getOrElse(0L),
            last.map(_._3).getOrElse(""), keep)
          state.update(ns)
          // only a non-empty buffer needs a watermark-advance wake-up; a
          // bare carried-last waits for new input (it emits nothing alone)
          if (ns.buffer.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          out.iterator
      }
  }

  /**
   * Streaming twin of the batch first-touch funnel
   * ([[graft.operators.Funnel.stepTimes]] / the `events_funnel` query):
   * emits one append-mode row per user per step the moment that step's
   * first-touch time is watermark-FINAL. Downstream a plain streaming
   * `groupBy(step).count()` maintains the live funnel report.
   *
   * Finality is the [[transitions]] argument: a step time may only be
   * emitted once no event can still arrive that would change it, i.e.
   * once the watermark passes the event (strict `us < watermark`).
   * Buffered events finalize in global (us, event_id) order — the same
   * total order every finalized-prefix operator here pins — and fold
   * through the funnel recurrence: step 1 = the first step-1-typed
   * event; step i+1 = the first step-(i+1)-typed event in the half-open
   * window (t_i, t_i + windowUnits]. Processing finalized events in
   * increasing time order makes "first" ≡ the batch operator's `min`,
   * and a skipped event can never become eligible later (eligibility
   * only depends on EARLIER step times, which are themselves final) —
   * so on a closed stream the (user, step, t) set equals the batch
   * cascade's exactly (StreamingSpec asserts this on randomized
   * out-of-order streams).
   *
   * State per user is at most |steps| longs once quiet (the min-time
   * carry) plus the watermark-horizon-bounded buffer; the buffer is
   * dropped once the user completes the funnel, and an EVENT-TIME
   * TIMEOUT flushes the buffers of users who go quiet. The |steps|-long
   * carry itself is RETAINED FOREVER, deliberately — `state.remove()`
   * after completion or a quiet-flush would let a later event recreate
   * the user as funnel-virgin and re-emit step rows, breaking
   * append-mode exactness (each (user, step) must appear at most once).
   * The trade is explicit: unbounded user cardinality costs
   * O(users × |steps|) longs of state store — the price of exactness
   * without an output-dedup pass; cap it operationally by bounding the
   * user-id universe per stream, not by removing state here.
   *
   * `events` needs (userCol, tsCol, idCol, typeCol).
   */
  def funnelSteps(events: DataFrame, steps: Seq[String], windowUnits: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type",
      watermarkDelay: String = "2 hours"): Dataset[FunnelStepOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUnits > 0, s"windowUnits must be positive, got $windowUnits")
    val spark = events.sparkSession
    import spark.implicits._
    val stepArr = steps.toArray
    // the watermarked ts column must survive the select for the
    // event-time timeout to be allowed (same constraint as sessionize)
    events.withWatermark(tsCol, watermarkDelay)
      .select(col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("us"),
        col(idCol).cast("long").as("event_id"),
        col(typeCol).cast("string").as("ty"), col(tsCol).as("ts"))
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelStepOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[FunnelState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(FunnelState(Nil, Nil))
          if (!state.hasTimedOut) {
            val add = rows.map(r => FunnelEvent(r._2, r._3, r._4)).toList
            st = st.copy(buffer = st.buffer ++ add)
          }
          val (fin, keep) = st.buffer.partition(_.us < wmUs)
          var reached = st.reached
          val out = Seq.newBuilder[FunnelStepOut]
          fin.sortBy(e => (e.us, e.eventId)).foreach { e =>
            val i = reached.length
            if (i < stepArr.length && e.ty == stepArr(i) &&
                (i == 0 || (e.us > reached.last &&
                  e.us <= reached.last + windowUnits))) {
              reached = reached :+ e.us
              out += FunnelStepOut(userId, i + 1, e.us)
            }
          }
          val ns = FunnelState(reached,
            if (reached.length == stepArr.length) Nil else keep)
          state.update(ns)
          // only a non-empty buffer needs a watermark-advance wake-up
          if (ns.buffer.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          out.result().iterator
      }
  }

  /**
   * Streaming twin of the batch cohort-retention triangle
   * ([[graft.operators.Cohort.retention]] / the `events_retention`
   * query): emits one append-mode row per user per (cohort, offset)
   * cell the moment that cell is watermark-FINAL. Downstream a plain
   * streaming `groupBy(cohort_period, period_offset).count()` maintains
   * the live retention grid (each user appears at most once per cell,
   * so count ≡ the batch COUNT DISTINCT).
   *
   * Why the cohort is final the moment the user's FIRST event
   * finalizes: the cohort is the user's min time bucket, and finality
   * is monotone — every event still in flight has event time ≥ the
   * watermark, which is strictly above every already-finalized event's
   * time, so no future event can land in an earlier bucket than the
   * earliest FINALIZED one (the [[transitions]] finality argument,
   * applied to `min`). Buffered events finalize in increasing time
   * order, so within the very first flush the minimum is applied before
   * any cell is computed from it.
   *
   * Same time math as the batch operator, integer end-to-end: bucket =
   * µs div `unitsPerBucket`, cohort = min bucket, offset =
   * (bucket − cohort) div `bucketsPerPeriod` — all operands
   * non-negative, so `div` (truncation) and floor agree and the
   * StreamingSpec pin compares bit-equal longs.
   *
   * State per user: the 1-long cohort carry, the emitted-offset list
   * (bounded by the user's distinct ACTIVE periods — weeks with ≥ 1
   * event, not stream length), and the watermark-horizon-bounded
   * buffer. As in [[funnelSteps]], state is retained once quiet —
   * removing it would let a later event re-emit already-final cells
   * and break append-mode exactness.
   *
   * `events` needs (userCol, tsCol).
   */
  def retentionCells(events: DataFrame, unitsPerBucket: Long,
      bucketsPerPeriod: Int, userCol: String = "user_id",
      tsCol: String = "ts",
      watermarkDelay: String = "2 hours"): Dataset[RetentionCellOut] = {
    require(unitsPerBucket > 0,
      s"unitsPerBucket must be positive, got $unitsPerBucket")
    require(bucketsPerPeriod > 0,
      s"bucketsPerPeriod must be positive, got $bucketsPerPeriod")
    val spark = events.sparkSession
    import spark.implicits._
    val perPeriod = bucketsPerPeriod.toLong
    events.withWatermark(tsCol, watermarkDelay)
      .select(col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol)).as("us"), col(tsCol).as("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionCellOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[RetentionState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption
            .getOrElse(RetentionState(false, 0L, Nil, Nil))
          if (!state.hasTimedOut)
            st = st.copy(buffer = st.buffer ++ rows.map(_._2))
          val (fin, keep) = st.buffer.partition(_ < wmUs)
          var hasC = st.hasCohort
          var cB = st.cohortBucket
          var emitted = st.emitted
          val out = Seq.newBuilder[RetentionCellOut]
          fin.sorted.foreach { us =>
            val b = Math.floorDiv(us, unitsPerBucket)
            if (!hasC) { hasC = true; cB = b }
            val off = Math.floorDiv(b - cB, perPeriod)
            if (!emitted.contains(off)) {
              emitted = off :: emitted
              out += RetentionCellOut(userId,
                Math.floorDiv(cB, perPeriod), off)
            }
          }
          state.update(RetentionState(hasC, cB, emitted, keep))
          if (keep.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          out.result().iterator
      }
  }
}
