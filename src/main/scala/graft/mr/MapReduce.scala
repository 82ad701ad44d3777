package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/**
 * The generic typed MapReduce API — the reference framework's real product,
 * re-expressed Spark-first.
 *
 * Parity contract of `RunMapReduceFramework` (reference
 * `MapReduceFramework.cpp:360-442`):
 *
 *   1. Map is a flatMap: each (K1,V1) emits 0..n (K2,V2) via `Emit2`
 *      (`MapReduceFramework.cpp:101-132,298-305`; the client emits 0 or 1,
 *      `Search.cpp:65-69`).
 *   2. Grouping is by key VALUE, not identity: the shuffle inserts into a
 *      `std::map` ordered by `operator<`, deleting duplicate key objects
 *      (`MapReduceFramework.cpp:38,183-193`). Spark's `groupByKey` on the
 *      encoded key value gives identical semantics.
 *   3. Value order within a group is UNSPECIFIED — the reference shuffle
 *      drains per-thread buffers LIFO while maps still emit
 *      (`MapReduceFramework.cpp:183-197`). Correct reducers must be
 *      order-insensitive; we preserve (and test) exactly that freedom.
 *   4. Reduce is a per-group flatMap: (K2, all V2s) emits 0..n (K3,V3)
 *      (`MapReduceFramework.cpp:135-164,307-310`).
 *   5. Output is globally sorted ascending by K3
 *      (`std::sort`, `MapReduceFramework.cpp:336-347`).
 *
 * Everything else in the reference — pthreads, the shuffle semaphore, chunked
 * work claiming, spin barriers, `autoDeleteV2K2` — is physical scheduling that
 * Spark's DAG scheduler + shuffle service subsume (SURVEY.md §3.2, §4.2).
 *
 * Scale note: `run` routes the reduce through `flatMapGroups`, which (like the
 * reference, which has no combiner — `MapReduceFramework.cpp` shuffles every
 * V2) moves every intermediate pair across the shuffle. For algebraic reduces
 * use `runAlgebraic`, which goes through a typed `Aggregator` so Catalyst
 * performs map-side partial aggregation — the scalable path at 100 TB.
 */
object MapReduce {

  /**
   * Full-generality parity entry point. `map` replaces Map+Emit2; `reduce`
   * replaces Reduce+Emit3 (emission by return value, not side effect).
   * Output is globally sorted by K3 (range-partitioned sort in Spark, so it
   * scales out instead of the reference's single-vector `std::sort`).
   */
  def run[K1, V1, K2, V2, K3, V3](
      input: Dataset[(K1, V1)],
      map: (K1, V1) => IterableOnce[(K2, V2)],
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)]
  )(implicit
      k2e: Encoder[K2],
      kv2e: Encoder[(K2, V2)],
      kv3e: Encoder[(K3, V3)]
  ): Dataset[(K3, V3)] = {
    input
      .flatMap { case (k1, v1) => map(k1, v1) }
      .groupByKey(_._1)
      .flatMapGroups { (k2, it) => reduce(k2, it.map(_._2)).iterator }
      .orderBy("_1") // MapReduceFramework.cpp:341 — global ascending K3 sort
  }

  /**
   * Algebraic fast path: when the reduce is a commutative-associative
   * aggregation (like the client's count, `Search.cpp:74`), express it as an
   * `Aggregator` so Spark plans partial (map-side) aggregation — the combiner
   * the reference lacks (SURVEY.md §2.5). At scale this is the difference
   * between shuffling every pair and shuffling one partial per key per
   * partition.
   */
  def runAlgebraic[K1, V1, K2, V2, B, V3](
      input: Dataset[(K1, V1)],
      map: (K1, V1) => IterableOnce[(K2, V2)],
      agg: Aggregator[V2, B, V3]
  )(implicit
      k2e: Encoder[K2],
      kv2e: Encoder[(K2, V2)],
      kv3e: Encoder[(K2, V3)]
  ): Dataset[(K2, V3)] = {
    // KeyValueGroupedDataset[(K2,V2)].agg needs a TypedColumn over the full
    // (K2,V2) row; lift the user's value-level Aggregator by dropping the key.
    val lifted = new Aggregator[(K2, V2), B, V3] {
      def zero: B = agg.zero
      def reduce(b: B, a: (K2, V2)): B = agg.reduce(b, a._2)
      def merge(b1: B, b2: B): B = agg.merge(b1, b2)
      def finish(b: B): V3 = agg.finish(b)
      def bufferEncoder: Encoder[B] = agg.bufferEncoder
      def outputEncoder: Encoder[V3] = agg.outputEncoder
    }
    input
      .flatMap { case (k1, v1) => map(k1, v1) }
      .groupByKey(_._1)
      .agg(lifted.toColumn.name("v3"))
      .orderBy("key")
  }

  /** The client's concrete reduce: count occurrences (`Search.cpp:72-78`). */
  def countAgg[V2]: Aggregator[V2, Long, Long] = new Aggregator[V2, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: V2): Long = b + 1L
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /**
   * The complete Search client pipeline (`Search.cpp:61-81` + framework sort)
   * over an arbitrary (name, searchWord) dataset: keep names containing the
   * word, count per name, sort by name. The algebraic path is used because
   * count is algebraic — same observable results as `run` with the literal
   * Map/Reduce lambdas.
   */
  def searchPipeline(input: Dataset[(String, String)])(implicit
      spark: SparkSession): Dataset[(String, Long)] = {
    import spark.implicits._
    runAlgebraic[String, String, String, Long, Long, Long](
      input,
      // Search.cpp:65-69 — emit (name, 1) iff name contains the search word
      (name, word) => if (name.contains(word)) Iterator.single((name, 1L)) else Iterator.empty,
      countAgg[Long]
    )
  }
}
