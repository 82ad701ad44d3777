package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Concat-and-chunk sequence packing — the GPT-style pretraining-data
 * former: lay every document's tokens (plus a separator) end-to-end in a
 * deterministic global order, then cut the resulting token stream into
 * fixed-length training sequences. The output maps each chunk to the doc
 * slices that fill it: `(chunk_id, doc_id, tok_begin, tok_end)` with
 * `[tok_begin, tok_end)` a 0-based token span WITHIN the document.
 *
 * This is a capability the reference's Search pipeline never needed but any
 * LLM-training pipeline built on this engine does (reference scope:
 * Search.cpp:61-81 stops at per-file match counts; packing is the step
 * after curation that turns surviving documents into model input).
 *
 * == The scale problem: a global running sum ==
 *
 * Every doc's stream offset is the sum of all preceding docs' lengths — a
 * prefix sum over a TOTAL order. The naive Spark spelling,
 * `Window.orderBy("doc_id")` with no partition spec, funnels the whole
 * table through ONE task (Spark warns exactly this); at 100 TB that is the
 * single worst plan the engine could produce. Instead this operator runs
 * the classic two-phase distributed prefix sum:
 *
 *  1. `repartitionByRange(doc_id)` — ranges are globally ordered, so
 *     partition i holds doc_ids strictly below partition i+1's. Only
 *     `(doc_id, n_tokens)` longs shuffle; text never moves.
 *  2. Per-partition totals (one long per partition) come to the driver —
 *     bounded by the partition count, the same legitimate-collect class as
 *     the IVF centroid fetch (Similarity.scala) — and their exclusive
 *     running sum is broadcast-joined back as each partition's base offset.
 *  3. A window partitioned BY SPARK PARTITION computes the within-partition
 *     exclusive running sum. Each window partition is one range slice —
 *     bounded by `spark.sql.shuffle.partitions`, never a hot key.
 *
 * Chunk spans then derive per-row with pure integer arithmetic (the whole
 * operator is exact — the DuckDB oracle replays it bit-for-bit), and a doc
 * crossing chunk boundaries explodes into one row per chunk it touches
 * (`sequence(first_chunk, last_chunk)` — plan-time-constant arithmetic, no
 * interpreted lambda). Per-doc fan-out is ceil(n/seqLen)+1 rows, and the
 * `sequence()` array materializes transiently before exploding — fine for
 * curated documents (thousands of tokens against seqLen in the hundreds),
 * but a pathological multi-billion-token row would allocate its whole
 * chunk-id array at once. `maxDocTokens` ENFORCES the cap inside the
 * operator (checked in the same totals pass — zero extra jobs): over-cap
 * docs either fail the job loudly with their count (default — a training
 * corpus with unexpected monster rows should stop the pipeline, not shift
 * the mix silently) or, with `dropOverCap = true`, are excluded from the
 * stream (offsets computed as if they never existed) and their count
 * logged. Upstream length filters (doc_length_hist / text_quality) remain
 * the right place to CHOOSE the cap; this parameter makes violating it
 * impossible rather than advisory.
 *
 * == Caller contract: this operator is EAGER ==
 *
 * Phase 2's totals collect (and the phase-1 persist feeding it) runs AT
 * CONSTRUCTION TIME — calling `packChunks` executes the whole upstream
 * pipeline (for `training_export`, the entire curation chain) before any
 * action on the returned DataFrame. Two consequences for callers:
 * plan-shape tests / `explain` on the result still pay the upstream
 * execution, and a tracked cache exists as soon as the call returns. The
 * intermediate keyed table is persisted through [[Caches.persistTracked]]
 * (two jobs read it: the totals collect and the main plan) — callers
 * materialize the result and then `Caches.releaseAll()`, or wrap the whole
 * thing — INCLUDING plan-only extraction — in `Caches.scoped { ... }`.
 *
 * @param docs         input with one row per document
 * @param idCol        unique orderable BIGINT document id (the packing order)
 * @param nTokens      token count column/expression (e.g.
 *                     `TextFunctions.tokenCount(col("text"))`)
 * @param seqLen       tokens per packed training sequence (chunk)
 * @param sepTokens    separator tokens appended after every document (EOS);
 *                     separator positions belong to no document slice
 * @param maxDocTokens per-document token cap (0 = unlimited). Docs with
 *                     `n > maxDocTokens` fail the job (default) or are
 *                     dropped-and-counted (`dropOverCap = true`).
 * @param dropOverCap  with a cap set, drop over-cap docs (logged) instead
 *                     of throwing
 */
object SequencePack {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def packChunks(
      docs: DataFrame,
      idCol: String,
      nTokens: Column,
      seqLen: Long,
      sepTokens: Long = 1L,
      maxDocTokens: Long = 0L,
      dropOverCap: Boolean = false): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(sepTokens >= 0, s"sepTokens must be non-negative, got $sepTokens")
    require(maxDocTokens >= 0, s"maxDocTokens must be non-negative, got $maxDocTokens")
    val spark = docs.sparkSession
    val cap = if (maxDocTokens > 0) maxDocTokens else Long.MaxValue

    // Phase 1: range-partition the (doc_id, n) pairs; freeze the partition
    // assignment in a tracked cache so the totals job and the main plan see
    // identical pids (range boundaries are sampled once, not re-derived).
    val keyed = Caches.persistTracked(
      docs
        .select(col(idCol).cast("long").as("doc_id"), nTokens.cast("long").as("n"))
        .repartitionByRange(col("doc_id"))
        .withColumn("pid", spark_partition_id()))

    // Phase 2: per-partition totals -> exclusive prefix offsets (driver-side
    // over <= shuffle-partition-count rows), broadcast back. The cap check
    // rides the same aggregate: totals sum only within-cap docs, and the
    // over-cap count comes back in the same ≤-partition-count collect.
    val totalsRows = keyed
      .groupBy("pid")
      .agg(
        sum(when(col("n") <= cap, col("n") + lit(sepTokens)).otherwise(0L)).as("t"),
        count(when(col("n") > cap, lit(1))).as("over"))
      .collect()
    val overCap = totalsRows.map(_.getLong(2)).sum
    if (overCap > 0L) {
      if (!dropOverCap)
        throw new IllegalArgumentException(
          s"sequence packing found $overCap document(s) over maxDocTokens=" +
            s"$maxDocTokens — cap the corpus upstream (doc_length_hist / " +
            "text_quality) or pass dropOverCap=true to exclude them")
      log.warn(s"sequence packing dropped $overCap document(s) over " +
        s"maxDocTokens=$maxDocTokens")
    }
    val totals = totalsRows
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val o = (pid, acc); acc += t; o
    }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("pid", "base")

    // Phase 3: within-partition exclusive running sum; global start offset =
    // partition base + within. Window partitions are range slices (bounded
    // size), NOT data keys — this is the documented exception to the
    // no-per-key-window rule.
    val w = Window
      .partitionBy("pid")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // Over-cap docs are out of the stream entirely (fail mode threw above,
    // so this filter only ever drops rows in dropOverCap mode) — the totals
    // already excluded them, and the running sum must agree.
    val started = keyed
      .filter(col("n") <= cap)
      .join(broadcast(offsetDf), "pid")
      .withColumn("st", col("base") + coalesce(sum(col("n") + lit(sepTokens)).over(w), lit(0L)))

    // Chunk spans: doc tokens occupy [st, st + n); chunks are L-sized cuts
    // of the global stream. All-integer arithmetic, oracle-exact.
    started
      .filter(col("n") > 0)
      .select(
        col("doc_id"),
        col("n"),
        col("st"),
        explode(sequence(
          expr(s"st DIV $seqLen"),
          expr(s"(st + n - 1) DIV $seqLen"))).as("chunk_id"))
      .select(
        col("chunk_id"),
        col("doc_id"),
        greatest(lit(0L), col("chunk_id") * seqLen - col("st")).as("tok_begin"),
        least(col("n"), (col("chunk_id") + 1) * seqLen - col("st")).as("tok_end"))
  }
}
