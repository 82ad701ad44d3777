package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MARKET-BASKET co-occurrence — pair counts of items appearing in the
 * same basket (order / session / document), the support-counting core of
 * association mining (the A-Priori first pass) and of "bought-together"
 * recommendation. Extension tier — the reference has no joins at all
 * (SURVEY.md §2.7).
 *
 * Scale shape: (1) collapse to DISTINCT (basket, item) first — one
 * partial-agg pass, so an item repeated in a basket (multiple lineitems
 * of one part) counts once; (2) self-equi-join on the basket key — a
 * co-partitioned shuffle join, never a cartesian (PlanSpec's
 * whole-surface sweep): per-basket work is C(k,2) over the BASKET size,
 * so with baskets bounded (TPC-H orders hold ≤ 7 parts; retail carts are
 * small) total pairs are linear in baskets. An unbounded-basket corpus
 * needs a cap first (top-k items per basket) — same lever as
 * [[Fuzzy]]'s block key. (3) `item_a < item_b` keeps one canonical
 * orientation per pair (the dedup pipelines' pair convention), and the
 * count partial-aggregates map-side.
 */
object Basket {

  private def distinctItems(rows: DataFrame, basket: String,
      item: String): DataFrame =
    rows.select(col(basket).as("bk"), col(item).as("it")).distinct()

  private def pairsFromItems(items: DataFrame): DataFrame = {
    val a = items.select(col("bk"), col("it").as("item_a"))
    val b = items.select(col("bk"), col("it").as("item_b"))
    a.join(b, "bk")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("cnt"))
  }

  /** (item_a, item_b, cnt): canonicalized same-basket co-occurrence
    * counts, one row per unordered item pair with support ≥ 1. */
  def pairCounts(rows: DataFrame, basket: String, item: String): DataFrame =
    pairsFromItems(distinctItems(rows, basket, item))

  /** (item_a, item_b, cnt, jaccard): item–item Jaccard similarity over
    * basket sets — |baskets(a) ∩ baskets(b)| / |baskets(a) ∪ baskets(b)|,
    * the memory-based collaborative-filtering / "bought-together" score.
    * Co-occurrence `cnt` IS the intersection; the union is
    * n_a + n_b − cnt from per-item basket counts — all exact integers,
    * and `jaccard` is ONE IEEE division of two of them, so an oracle
    * reproduces every bit. Only pairs with cnt ≥ 1 appear (Jaccard 0
    * pairs are the quadratic non-answer a 100 TB catalog cannot emit).
    *
    * Scale shape: the distinct (basket, item) pass is computed ONCE,
    * materialized as a lineage-truncated leaf (checkpointTracked — it
    * feeds FOUR subtrees: both sides of the pair join and the per-item
    * counts twice); per-item counts are |items| rows — AQE broadcasts
    * them into the two enrichment joins. */
  def itemJaccard(rows: DataFrame, basket: String, item: String): DataFrame = {
    val items = Caches.checkpointTracked(distinctItems(rows, basket, item))
    val counts = items.groupBy("it").agg(count(lit(1)).as("n"))
    pairsFromItems(items)
      .join(counts.select(col("it").as("item_a"), col("n").as("n_a")), "item_a")
      .join(counts.select(col("it").as("item_b"), col("n").as("n_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("cnt"),
        (col("cnt").cast("double") /
          (col("n_a") + col("n_b") - col("cnt")).cast("double")).as("jaccard"))
  }
}
