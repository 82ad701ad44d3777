package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy matching (entity resolution) — the classic
 * blocking-then-comparison shape: a cheap deterministic BLOCK KEY buys
 * candidate generation as an equi-join, and the expensive string distance
 * runs only within blocks. Extension tier: the reference has no joins at
 * all (SURVEY.md §2.7); its only string op is substring containment
 * (`Search.cpp:65`).
 *
 * Scale shape, in order:
 *  1. collapse rows to the DISTINCT-name vocabulary with support counts —
 *     one partial-agg pass; every later cost is in vocabulary size, not
 *     corpus size;
 *  2. self-equi-join the vocabulary on the caller's block key — a plain
 *     shuffle join, never a cartesian (PlanSpec-pinned); work is
 *     sum-of-squares over BLOCK sizes, so the caller's key choice is the
 *     lever (a skewed block degrades to quadratic — pick a key whose
 *     largest block is bounded, or tighten it with a length band);
 *  3. `levenshtein` (native codegen'd builtin, identical classic
 *     edit-distance semantics in DuckDB — the oracle replays it) filters
 *     pairs to `maxDist`, computed once per candidate pair.
 *
 * `name_a < name_b` keeps one canonical orientation per pair, mirroring
 * the dedup pipelines' pair convention.
 */
object Fuzzy {

  /** Near-identical value pairs of `nameCol` under `blockKey`, with
    * per-name support counts (`n_a`, `n_b`) so downstream resolution can
    * pick the canonical survivor by frequency. */
  def blockedLevenshteinPairs(rows: DataFrame, nameCol: String,
      blockKey: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "fuzzy: maxDist must be non-negative")
    val names = rows.groupBy(nameCol).agg(count(lit(1)).as("n"))
      .withColumn("_blk", blockKey(col(nameCol)))
    val a = names.select(col(nameCol).as("name_a"), col("n").as("n_a"), col("_blk"))
    val b = names.select(col(nameCol).as("name_b"), col("n").as("n_b"), col("_blk"))
    a.join(b, "_blk")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }
}
