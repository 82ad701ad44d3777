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

  /**
   * FREQUENT 3-ITEMSETS by the A-PRIORI principle (Agrawal & Srikant
   * 1994): (item_a < item_b < item_c, support) for every triple
   * co-occurring in ≥ `minSupport` baskets — the next lattice level above
   * [[pairCounts]]' pairs (and the input to 2→3 association rules).
   *
   * The A-priori downward-closure prunes are what make the triple join
   * survive a 100 TB basket log — each one shrinks the joined frames
   * BEFORE the expensive step:
   *  1. items below `minSupport` support can't be in any frequent triple
   *     → the basket stream is semi-joined down to frequent items first;
   *  2. a triple's (a,b) prefix must itself be a frequent PAIR → the
   *     per-basket pair frame is semi-joined against the frequent-pair
   *     set before the third item joins on;
   *  3. the remaining (a,c) and (b,c) sub-pairs must be frequent too →
   *     two more semi-joins on the candidate triples, so the final
   *     support count shuffles only candidates whose every sub-pair
   *     passed (the classic candidate-generation step, as joins instead
   *     of a driver-side lattice).
   * All equi-joins on (basket|pair) keys, all counts partial-aggregated,
   * everything integer — never a window, never a cartesian; the pruned
   * basket stream is checkpoint-tracked once and feeds all three legs.
   * (Caller releases via Caches.releaseAll(), the standard contract.)
   */
  def frequentTriples(rows: DataFrame, basket: String, item: String,
      minSupport: Long): DataFrame = {
    val items = distinctItems(rows, basket, item)
    val freqItems = items.groupBy("it").agg(count(lit(1)).as("ci"))
      .filter(col("ci") >= minSupport).select("it")
    val fit = Caches.checkpointTracked(
      items.join(freqItems, Seq("it"), "left_semi"))
    val freqPairs = Caches.checkpointTracked(
      pairsFromItems(fit).filter(col("cnt") >= minSupport)
        .select("item_a", "item_b"))
    val basketPairs = fit.select(col("bk"), col("it").as("item_a"))
      .join(fit.select(col("bk"), col("it").as("item_b")), "bk")
      .filter(col("item_a") < col("item_b"))
      .join(freqPairs, Seq("item_a", "item_b"), "left_semi")
    basketPairs
      .join(fit.select(col("bk"), col("it").as("item_c")), "bk")
      .filter(col("item_c") > col("item_b"))
      .join(freqPairs.select(col("item_a"), col("item_b").as("item_c")),
        Seq("item_a", "item_c"), "left_semi")
      .join(freqPairs.select(col("item_a").as("item_b"),
          col("item_b").as("item_c")),
        Seq("item_b", "item_c"), "left_semi")
      .groupBy("item_a", "item_b", "item_c")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
