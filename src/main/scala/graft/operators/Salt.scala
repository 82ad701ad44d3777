package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Manual key-salting for skewed equi-joins — the fallback when AQE's skew
 * handling doesn't apply (e.g. the skewed side feeds a shuffled hash join
 * whose one hot key pins a single task) and the dimension is too big to
 * broadcast outright.
 *
 * `saltedJoin(fact, dim, key, buckets)`:
 *  - fact rows get a deterministic pseudo-random salt in [0, buckets) —
 *    spreading a hot key's rows over `buckets` shuffle partitions;
 *  - dim rows are exploded ×buckets (one copy per salt value);
 *  - the join key becomes (key, salt), so no single task owns a hot key.
 *
 * Inner-join semantics are IDENTICAL to `fact.join(dim, key)` (asserted in
 * SaltSpec); cost is the dim-side ×buckets replication — use when
 * |dim| · buckets ≪ |fact|'s hot-key mass. The salt is `xxhash64` over the
 * ENTIRE fact row — a pure function of row content, so a task retry or a
 * recomputed shuffle block re-derives the SAME salt (a row-position salt
 * like `monotonically_increasing_id` is only stable within one run and can
 * re-salt differently under recomputation). Identical duplicate rows share
 * a salt; a hot KEY spreads as long as its rows differ in any attribute,
 * which is what fact tables look like.
 *
 * CALLER CONTRACT — salt BEFORE projecting away discriminating columns:
 * because the salt is a content hash, a fact projected down to
 * low-cardinality columns (e.g. just (key, qty)) collapses the hot key's
 * rows onto at most |distinct projected rows| salt values — and fully
 * duplicated rows onto ONE, making the salt a no-op exactly where it is
 * needed. Pass the fact with its natural key (or any high-cardinality
 * attributes) still present and project after the join; Catalyst prunes
 * the extra columns the moment the salt has been computed.
 */
object Salt {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets.toLong))
        .cast("int"))
    val exploded = dim.withColumn("_salt",
      explode(typedLit((0 until buckets).toList)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Convenience: salted join followed by an algebraic aggregation — the
    * common shape (join skewed fact to dim, then aggregate). */
  def saltedJoinAgg(fact: DataFrame, dim: DataFrame, key: String,
      groupCols: Seq[String], aggs: Seq[Column], buckets: Int = 16): DataFrame =
    saltedJoin(fact, dim, key, buckets)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
}
