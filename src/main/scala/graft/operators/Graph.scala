package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * GRAPH TRIANGLE STATISTICS — exact triangle / wedge counting with the
 * global clustering coefficient, over an undirected edge list (e.g. an
 * item co-occurrence graph, a near-dup pair graph, a citation mesh).
 * Extension tier — the reference has no graph ops at all; this completes
 * the graph toolkit next to the dedup tier's connected components
 * ([[Dedup.duplicateClusters]]).
 *
 * Algorithm: the classic DEGREE ORIENTATION (Chiba–Nishizeki / the
 * "compact-forward" join form): orient every undirected edge from its
 * lower-(degree, id) endpoint to its higher one — a total order, so each
 * triangle is discovered EXACTLY once, as the wedge (u→v, u→w) with
 * ord(v) < ord(w) closed by the oriented edge v→w. Orientation bounds
 * every out-neighborhood by O(√m), so the wedge join does O(m^1.5) work
 * total regardless of degree skew — the hub that would explode a naive
 * neighbor join fans its edges OUT to its low-degree endpoints instead.
 * That is the property that survives a power-law graph at 100 TB; the
 * id-only canonical orientation (a < b) does not have it.
 *
 * Everything is exact integer arithmetic (counts, degrees, wedge
 * binomials in BIGINT) except the final clustering coefficient — ONE
 * IEEE division 3·T / W of two exact integers (NULL when the graph has
 * no wedges), so an oracle reproduces every output bit.
 *
 * Scale shape: canonical edges are computed once and tracked-persisted
 * (they feed degrees, orientation, and the closing semi-join); degrees
 * partial-aggregate; the orientation joins are equi-joins on node ids
 * (the degree table is |V| rows — AQE broadcasts it when small); the
 * wedge join is equi on the source node with the ord() comparison as a
 * post-join filter; the closing check is a LEFT SEMI join on the
 * (v, w) pair — never a cartesian, never a per-key window.
 */
object Graph {

  /**
   * THE ITERATION SCAFFOLD shared by every fixed-k iterative operator in
   * the toolkit ([[pageRank]], [[labelPropagation]], [[bfs]], [[sssp]]):
   * run `steps` rounds of `step`, handing each round a `cap` function
   * that is [[Caches.checkpointTrackedFreshStats]] on every `capEvery`-th
   * round AND on the final round, identity otherwise. Capping the final
   * round is deliberate (r14 contract): loops return MATERIALIZED leaves,
   * because an uncapped tail is re-derived once per downstream reference
   * — a consumer that mixes the loop state into several legs multiplies
   * the whole tail's cost (the modularityTotal 113-codegen-stage
   * regression). Consequence: re-executing a returned loop frame after
   * `Caches.releaseAll()` is invalid — the leaf's blocks are gone.
   *
   * Why the cap exists: each round's logical plan nests every previous
   * round's, so an uncapped k-round loop grows the plan exponentially in
   * analysis/AQE cost; truncating the (|V|-bounded) iterated frame every
   * few rounds keeps planning linear in k at the price of a cheap eager
   * job. Why `cap` is an argument to `step` rather than applied to
   * `step`'s result: loops like [[bfs]] must truncate an INNER frame
   * (the new level, before it is unioned into the running state) — the
   * helper cannot know which sub-frame is the right leaf, the loop body
   * does.
   *
   * The state is a type parameter because the loops carry different
   * shapes (pageRank/LPA: one rank/label frame; bfs: (visited, frontier);
   * sssp: one distance frame).
   */
  private[graft] def iterate[S](init: S, steps: Int, capEvery: Int)(
      step: (S, Int, DataFrame => DataFrame) => S): S = {
    var s = init
    for (i <- 1 to steps) {
      // fresh-stats variant: a loop cap wants the checkpoint's lineage
      // TRUNCATION, not its stats memory — inherited origin stats
      // compound (exponentially, for loops that join their state twice
      // per round) into million-digit BigInt estimates; see
      // Caches.checkpointTrackedFreshStats.
      // The FINAL round is capped too (an r14 change — it used to stay
      // lazy): a loop's last uncapped rounds ride into the consumer as a
      // plan that references the last leaf once PER per-round state
      // reference, multiplicatively — modularityTotal over a 4-round LPA
      // carried a 113-codegen-stage tree and re-derived the tail per
      // mixing leg (measured 7 → 17.6 s at sf0.1 after the loop joins
      // went broadcast). Returning a materialized |V| leaf costs one
      // eager job and makes every composition read it for free; rows
      // identical, laziness was never part of the operator contract.
      val cap: DataFrame => DataFrame =
        if (capEvery > 0 && (i % capEvery == 0 || i == steps))
          Caches.checkpointTrackedFreshStats
        else identity
      s = step(s, i, cap)
    }
    s
  }

  /**
   * EXACT-FIXPOINT EARLY EXIT variant of [[iterate]], for loops whose
   * step is a pure deterministic function of (state, fixed graph) AND
   * whose wired round count is a measured-fixpoint-plus-margin: the step
   * returns `(next, done)` and the loop stops after the first round that
   * reports `done = true`.
   *
   * BIT-IDENTITY ARGUMENT (why this cannot change any oracle hash): a
   * loop may only report done when further rounds are provably no-ops —
   * either its state reached an exact fixpoint (`step(s) = s` as a row
   * multiset, so by purity `stepⁿ(s) = s` for all n) or its per-round
   * delta frame (BFS frontier, Borůvka selection) is EMPTY and the step
   * only ever unions/merges that delta into the state. In both cases the
   * early result equals the full-`maxSteps` result row-for-row, so the
   * oracle — which still replays the whole unrolled chain — matches
   * exactly as before; only wall-clock changes (corenum wires 20 rounds
   * where sf0.1 converges in ~4: every idempotent round still paid its
   * |E| joins before this).
   *
   * Loops with FLOATING-POINT state (pageRank, HITS) stay on [[iterate]]:
   * their state never reaches exact equality, so a check would be pure
   * overhead. Loops whose OUTPUT is a per-round trajectory with a row per
   * wired round (kTrussTrajectory) must also stay: skipping idle rounds
   * would drop their census rows.
   *
   * Unlike [[iterate]] the cap cannot skip the (unknown) final round —
   * the one extra eager |V|-row job at the true fixpoint is the price of
   * knowing it is one.
   */
  private[graft] def iterateUntil[S](init: S, maxSteps: Int, capEvery: Int)(
      step: (S, Int, DataFrame => DataFrame) => (S, Boolean)): S = {
    var s = init
    var i = 1
    var done = false
    while (i <= maxSteps && !done) {
      val cap: DataFrame => DataFrame =
        if (capEvery > 0 && i % capEvery == 0)
          Caches.checkpointTrackedFreshStats
        else identity
      val (ns, d) = step(s, i, cap)
      s = ns
      done = d
      i += 1
    }
    s
  }

  /** MONOTONE-loop fixpoint detector (r16): (row count, Σ of one integer
    * value column) of a keyed state frame, collected in ONE tiny
    * aggregate over the (already-capped, materialized) |V| leaf. For a
    * loop whose round can only move the state ONE WAY — the key set only
    * grows (sssp) or only shrinks (kCore peeling) AND the value column is
    * pointwise non-increasing (sssp costs relax downward, the h-index
    * iteration is non-increasing) — scalar equality of (count, sum)
    * across rounds IS frame equality: equal counts force the key sets
    * equal (one contains the other), and an equal sum of pointwise-≤
    * longs forces every value equal. Replaces the r14 `stateUnchanged`
    * detector (a per-round |V|⋈|V| full-outer join — 2 exchanges + join
    * per round — asserting full keyed-relation equality) with one scalar
    * job; the round-over-round fingerprints ride in the loop closure, so
    * only `next` is ever scanned. Exact long arithmetic only; NEVER use
    * with floating-point state. */
  private def countSumFingerprint(frame: DataFrame, valueCol: String):
      (Long, Long) = {
    val r = frame.agg(count(lit(1)), sum(col(valueCol))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Distinct (`src`,`dst`) edges, pre-partitioned AND pre-sorted by the
    * per-iteration join key BEFORE the checkpoint leaf: localCheckpoint
    * preserves the physical partitioning/ordering, so each of a loop's k
    * joins re-reads an already-src-clustered base — only the |V|-bounded
    * iterated side exchanges per step, the |E|-row base never re-shuffles
    * or re-sorts. Shared by every iterative operator. */
  private def checkpointEdges(edges: DataFrame, src: String,
      dst: String): DataFrame =
    Caches.checkpointTrackedLayout(
      edges.select(col(src), col(dst)).distinct(),
      hashCols = Seq(src), sortCols = Seq(src))

  /**
   * PAGERANK (Page et al. 1999) over a DIRECTED distinct edge list, k
   * fixed power-iteration steps — the graph-centrality completion of the
   * toolkit (components: [[Dedup.duplicateClusters]]; local structure:
   * [[triangleStats]]).
   *
   * Caller contract: `edges` are distinct (src, dst) pairs and every
   * node appears as a src (no dangling nodes — pass both directions for
   * an undirected graph, which guarantees it); the graph is non-empty.
   *
   * TWO AGGREGATION MODES for the per-node incoming mass:
   *
   *  - `exact = true` (oracle mode): a deterministic TWO-LEVEL fold.
   *    Contributions are salted into `foldBuckets` buckets by
   *    `src % foldBuckets` (a plan-time constant), sorted-folded WITHIN
   *    each (dst, bucket) group by contributor id, and the per-bucket
   *    partial sums are then sorted-folded by bucket id. The addition
   *    order is still a pure function of the graph — DuckDB replays it
   *    as two nested list_sort + list_reduce levels — but no single
   *    aggregation key ever owns more than ~in-degree/B contributions:
   *    a hub's in-edges become B independently sort-spillable groups
   *    (still within ONE task under the one-exchange plan below — see
   *    the repartition comment) instead of one unbounded array (the flat
   *    sorted-fold's 100×-scale hazard: a 10⁷-in-degree hub = one 10⁷
   *    element array in one aggregation buffer).
   *  - `exact = false` (production mode): a plain `sum()` — full
   *    map-side partial aggregation, only (dst, partial-sum) rows cross
   *    the shuffle, bounded state per key. The result differs from the
   *    exact mode only by IEEE addition order (bounded by k·ulp-level
   *    re-association noise); this is the mode a real 100 TB power-law
   *    graph should run.
   *
   * Shared determinism machinery: degrees and N are integer aggregates;
   * the update (1−d)/N + d·Σ is one fixed-shape expression with the jump
   * constant computed ONCE driver-side ((1.0 − d)/N — the oracle spells
   * the same subtraction, never a pre-folded 0.15 literal, because
   * 1.0 − 0.85 is NOT 0.15 in IEEE doubles).
   *
   * Scale shape: the (src, dst, deg) contribution base is built once and
   * checkpoint-tracked (k iterations re-read it without re-deriving);
   * each step is one equi-join (rank onto src) + partial-aggregated
   * groupBys — never a window, never a cartesian; node count N is
   * the one bounded driver-side collect (a single long). k=O(10) steps
   * of join+agg is the standard distributed PageRank shape — at 1000
   * executors each step is one shuffle of |E| (long, long, double) rows
   * in exact mode and |partials| rows in production mode.
   *
   * Output: (node, pr) — rank after `iterations` steps.
   */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85, src: String = "src", dst: String = "dst",
      exact: Boolean = true, foldBuckets: Int = 16): DataFrame = {
    // ONE materialization of the distinct edge base (r15): the old shape
    // checkpointed e⋈deg and nodes separately, so the upstream edge
    // DERIVATION (for the wired queries, a lineitem self-join + distinct)
    // was evaluated three times per build — once per subtree (e, deg-from-e,
    // nodes-from-deg-from-e). Deriving deg FROM the leaf runs the
    // derivation exactly once, and the leaf's claimed HashPartitioning(src)
    // makes the degree aggregate exchange-free. deg rides in the LOOP STATE
    // (the louvain state-carried-degree trick) so no per-edge deg column is
    // ever materialized — values bit-identical: same integer deg, same
    // fixed-shape contribution expression, just routed through the state.
    val base = Caches.checkpointTrackedLayout(
      edges.select(col(src), col(dst)).distinct(),
      hashCols = Seq(src), sortCols = Seq(src))
    val deg = Caches.checkpointTracked(
      base.groupBy(col(src).as("node")).agg(count(lit(1)).as("deg")))
    val n = deg.count() // bounded eager job: ONE driver-side long
    val jump = (1.0 - damping) / n.toDouble
    val r0 = deg.select(col("node"), lit(1.0 / n.toDouble).as("pr"),
      col("deg"))
    prLoop(base, deg, r0, lit(jump),
      col("pr") / col("deg").cast("double"),
      iterations, damping, exact, foldBuckets, src, dst, carry = Seq("deg"))
  }

  /**
   * WEIGHTED PAGERANK over a DIRECTED edge list with POSITIVE INTEGER
   * weights (the co-purchase strength, a click count, a message
   * volume): identical power iteration to [[pageRank]] except each
   * node's rank is distributed over its out-edges PROPORTIONALLY to
   * weight — contribution = pr·w/sw with sw = Σ out-weights — so
   * centrality follows traffic mass, not mere adjacency (the natural
   * companion to [[sssp]]'s weighted distances on the same graph).
   *
   * Caller contract: one row per distinct (src, dst) with its weight
   * (positive — a zero-weight edge should just be absent); every node
   * appears as a src. Everything else — the checkpointed
   * (src, dst, w, sw) base, the hub-safe two-level exact fold /
   * production `sum()` mode, the one-exchange shape, the uniform
   * teleport — is [[pageRank]]'s machinery verbatim via the shared
   * loop. The contribution's op order is fixed as (pr · w) / sw
   * (integers cast to double first), which an oracle mirrors; with all
   * weights equal to 1 it degenerates to pr·1.0/deg = pr/deg
   * BIT-FOR-BIT (IEEE x·1.0 = x), so the unweighted operator is
   * literally this one's w ≡ 1 special case — GraphSpec pins that law.
   */
  def pageRankWeighted(edges: DataFrame, iterations: Int = 5,
      damping: Double = 0.85, src: String = "src", dst: String = "dst",
      weight: String = "w", exact: Boolean = true,
      foldBuckets: Int = 16): DataFrame = {
    // the pageRank r15 one-materialization shape: weighted base leaf, the
    // out-weight total sw derived FROM the leaf (exchange-free on its
    // claimed layout) and carried in the loop state — the derivation runs
    // once instead of three times, contribution values bit-identical
    val base = Caches.checkpointTrackedLayout(
      edges.select(col(src), col(dst), col(weight).as("w")),
      hashCols = Seq(src), sortCols = Seq(src))
    val sw = Caches.checkpointTracked(
      base.groupBy(col(src).as("node")).agg(sum(col("w")).as("sw")))
    val n = sw.count() // bounded eager job: ONE driver-side long
    val jump = (1.0 - damping) / n.toDouble
    val r0 = sw.select(col("node"), lit(1.0 / n.toDouble).as("pr"),
      col("sw"))
    prLoop(base, sw, r0, lit(jump),
      col("pr") * col("w").cast("double") / col("sw").cast("double"),
      iterations, damping, exact, foldBuckets, src, dst, carry = Seq("sw"))
  }

  /**
   * PERSONALIZED PAGERANK (the topic-sensitive variant, Haveliwala
   * 2002): identical power iteration to [[pageRank]] except the teleport
   * mass lands only on a SEED SET S — jump_v = (1−d)/|S| for v ∈ S and 0
   * elsewhere, r0 = 1/|S| on S — so ranks measure proximity TO THE SEEDS
   * ("what else does this neighborhood buy", related-item retrieval,
   * seed-expansion labeling) instead of global centrality.
   *
   * `seeds` are PLAN CONSTANTS (an `isin` predicate — the caller
   * collects them, a bounded driver-side list by contract: seed sets
   * are hand-sized, like [[bfs]]'s source). Everything else — the
   * checkpointed contribution base, the hub-safe two-level exact fold /
   * production `sum()` mode, the one-exchange shape — is [[pageRank]]'s
   * machinery verbatim via the shared loop, so the same oracle technique
   * replays it (the jump term becomes a CASE over seed membership; the
   * driver computes (1−d)/|S| with the same subtraction the oracle
   * spells). Caller contract on `edges` matches [[pageRank]].
   */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
      iterations: Int = 5, damping: Double = 0.85, src: String = "src",
      dst: String = "dst", exact: Boolean = true,
      foldBuckets: Int = 16): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs a non-empty seed set")
    require(seeds.distinct.size == seeds.size,
      s"personalizedPageRank seeds must be distinct: $seeds")
    val (base, deg) = pprBase(edges, src, dst)
    // Seeds must be src nodes of the graph: an absent seed would silently
    // lose its teleport + initial-mass share (total rank < 1, quietly
    // diverging from the documented semantics). One shuffle-free scan of
    // the ALREADY-checkpointed degree frame (localCheckpoint is eager —
    // nothing recomputes), so the guard costs a narrow count, not a job
    // over the raw edges.
    val present = deg.filter(col("node").isin(seeds: _*))
      .agg(count(lit(1))).collect()(0).getLong(0)
    require(present == seeds.size,
      s"personalizedPageRank: ${seeds.size - present} of ${seeds.size} " +
        "seeds are not src nodes of the graph (teleport mass would be lost)")
    pprLoop(base, deg, seeds, iterations, damping, exact, foldBuckets,
      src, dst)
  }

  /** [[personalizedPageRank]] seeded by the graph's `nSeeds` SMALLEST src
    * nodes — the bfsFromMinSource convention applied to the seed set. The
    * seeds are collected off the ALREADY-checkpointed degree leaf (one
    * bounded nSeeds-row job), so picking them costs a leaf aggregate
    * instead of a second full edge derivation (the wired query previously
    * paid the lineitem self-join + distinct twice: once for the seed
    * collect, once inside the operator — measured ~25% of graph_ppr).
    * Seeds are src nodes BY CONSTRUCTION, so the explicit-seed guard is
    * superfluous here. Same rows as personalizedPageRank(edges, those
    * seeds) — GraphSpec pins the law. */
  def personalizedPageRankMinSeeds(edges: DataFrame, nSeeds: Int,
      iterations: Int = 5, damping: Double = 0.85, src: String = "src",
      dst: String = "dst", exact: Boolean = true,
      foldBuckets: Int = 16): DataFrame = {
    require(nSeeds > 0, "personalizedPageRankMinSeeds needs nSeeds > 0")
    val (base, deg) = pprBase(edges, src, dst)
    val seeds = deg.select(col("node")).orderBy(col("node")).limit(nSeeds)
      .collect().map(_.getLong(0)).toSeq // bounded nSeeds-row collect
    require(seeds.size == nSeeds,
      s"personalizedPageRankMinSeeds: graph has only ${seeds.size} src " +
        s"nodes, $nSeeds seeds requested")
    pprLoop(base, deg, seeds, iterations, damping, exact, foldBuckets,
      src, dst)
  }

  /** The pageRank r15 one-materialization base shared by both
    * personalized faces: distinct-edge leaf laid out by the per-round
    * join key + the degree leaf derived from it (exchange-free on the
    * claimed layout). */
  private def pprBase(edges: DataFrame, src: String,
      dst: String): (DataFrame, DataFrame) = {
    val base = Caches.checkpointTrackedLayout(
      edges.select(col(src), col(dst)).distinct(),
      hashCols = Seq(src), sortCols = Seq(src))
    val deg = Caches.checkpointTracked(
      base.groupBy(col(src).as("node")).agg(count(lit(1)).as("deg")))
    (base, deg)
  }

  private def pprLoop(base: DataFrame, deg: DataFrame, seeds: Seq[Long],
      iterations: Int, damping: Double, exact: Boolean, foldBuckets: Int,
      src: String, dst: String): DataFrame = {
    val jumpS = (1.0 - damping) / seeds.size.toDouble
    val isSeed = col("node").isin(seeds: _*)
    val r0 = deg.select(col("node"),
      when(isSeed, lit(1.0 / seeds.size.toDouble)).otherwise(lit(0.0d))
        .as("pr"), col("deg"))
    prLoop(base, deg, r0,
      when(isSeed, lit(jumpS)).otherwise(lit(0.0d)),
      col("pr") / col("deg").cast("double"),
      iterations, damping, exact, foldBuckets, src, dst, carry = Seq("deg"))
  }

  /** The shared power-iteration loop behind [[pageRank]] /
    * [[personalizedPageRank]] / [[pageRankWeighted]] — see pageRank's
    * scaladoc for the exact-vs-production fold modes and the
    * one-exchange argument. `jumpCol` is the per-node teleport term (a
    * literal for the uniform walk, a seed-membership CASE for the
    * personalized one); `contribC` is the per-edge contribution
    * expression over the base's columns plus the joined `pr`
    * (pr/deg for the uniform walk, pr·w/sw for the weighted one). */
  /** The hub-safe deterministic per-key contribution sum shared by the
    * rank loops and [[hits]]: `contribs` carries (`key`, `by`, c);
    * exact mode folds in two sorted levels — elements salted into
    * `foldBuckets` buckets by `by` % B, sorted-folded within each
    * (key, bucket), the ≤B bucket sums sorted-folded by bucket id.
    * ONE exchange for BOTH fold levels: HashPartitioning(key) satisfies
    * ClusteredDistribution(key, bkt) (a superset of the partitioning
    * keys) and survives the first aggregate, so the (key, bkt) fold and
    * the per-key bucket fold both run shuffle-free on it — same
    * per-step shuffle volume as a flat fold, while a hub's buffered
    * state is still B independent sort-fallback-spillable groups of
    * ~in-degree/B instead of one unbounded array (the two-shuffle
    * per-(key,bkt) exchange variant buys cross-task hub parallelism at
    * the price of a second ~|E|-sized exchange per step — the
    * production answer for that graph is `exact = false`, not a pricier
    * fold). Output: (node, s). */
  private def foldedContribSum(contribs: DataFrame, key: String,
      by: String, exact: Boolean, foldBuckets: Int): DataFrame =
    // both fold levels run through the NATIVE in-order sum (r16,
    // graft.expressions.ArrayFieldSum — bit-identical to the interpreted
    // `aggregate` HOF it replaces: same adds in the same sorted order,
    // so the list_reduce oracles keep matching; ArrayFieldSumSpec pins
    // the twin). The HOF paid a lambda dispatch + InternalRow wrapper
    // per contribution, per round, on the |E|-sized hot path.
    if (exact) contribs
      .select(col(key), (col(by) % lit(foldBuckets.toLong)).as("bkt"),
        struct(col(by), col("c")).as("sc"))
      .repartition(col(key))
      .groupBy(col(key), col("bkt"))
      .agg(sort_array(collect_list(col("sc"))).as("cs"))
      .select(col(key), col("bkt"),
        graft.functions.VectorFunctions.fieldSum(col("cs"), 1).as("bs"))
      .select(col(key), struct(col("bkt"), col("bs")).as("bc"))
      .groupBy(col(key))
      .agg(sort_array(collect_list(col("bc"))).as("bcs"))
      .select(col(key).as("node"),
        graft.functions.VectorFunctions.fieldSum(col("bcs"), 1).as("s"))
    else contribs
      .groupBy(col(key))
      .agg(sum(col("c")).as("s"))
      .select(col(key).as("node"), col("s"))

  private def prLoop(base: DataFrame, nodes: DataFrame, r0: DataFrame,
      jumpCol: Column, contribC: Column, iterations: Int, damping: Double,
      exact: Boolean, foldBuckets: Int, src: String, dst: String,
      carry: Seq[String]): DataFrame = {
    // `carry` = the constant per-node columns (deg / sw) riding in the
    // loop state (r15): the contribution expression reads them off the
    // joined state instead of an |E|-materialized edge column, so the
    // base leaf stays (src, dst[, w]) and the node-side build is derived
    // from it once. `nodes` is the carrying leaf (node, carry...); the
    // per-round update re-attaches the carried columns from it — same
    // integer values every round, bit-identical ranks.
    // rank-lineage cap every 2nd step (see [[iterate]]) on the |V|-row
    // rank frame
    iterate(r0, iterations, capEvery = 2) { (r, _, cap) =>
      val contribs = base
        .join(r.select(col("node").as(src) +: col("pr") +:
          carry.map(col): _*), src)
        .select(col(dst), col(src), contribC.as("c"))
      val sums = foldedContribSum(contribs, dst, src, exact, foldBuckets)
      cap(nodes.join(sums, Seq("node"), "left")
        .select(col("node") +:
          (jumpCol + lit(damping) * coalesce(col("s"), lit(0.0d)))
            .as("pr") +: carry.map(col): _*))
    }.select("node", "pr")
  }

  /**
   * HITS — hubs and authorities (Kleinberg 1999) over a DIRECTED
   * distinct edge list, k synchronous mutual-reinforcement rounds:
   *
   *   auth(v) ← Σ_{u→v} hub(u),   hub(v) ← Σ_{v→w} auth(w)
   *
   * each vector rescaled by its MAXIMUM after every half-step.
   * Max-normalization — not the textbook L2 — is deliberate and
   * semantics-preserving: the HITS iteration is power iteration on AᵀA
   * (authorities) / AAᵀ (hubs), which is invariant under any per-step
   * positive rescaling, so the converged DIRECTION (and every ranking)
   * is Kleinberg's; but an L2 norm is a GLOBAL double sum — partition-
   * order dependent and un-replayable — where max over doubles is
   * order-independent, which is what lets a DuckDB oracle replay every
   * round bit-for-bit (the same reason [[modularityTotal]] sums
   * integers, never doubles). Per-step max also keeps every value in
   * [0, 1] — no overflow at any round count.
   *
   * Determinism: contribution sums go through the SAME hub-safe
   * two-level fold as [[pageRank]] (`exact = true`; `exact = false` is
   * the production partial-agg `sum()`), the max is one
   * order-independent aggregate collected to the driver as a plan
   * literal (two bounded 1-row collects per round — the [[pageRank]] N
   * pattern), and the division is one fixed-shape double op.
   *
   * Scale shape: the edge base is checkpointed TWICE, pre-partitioned/
   * pre-sorted by src for the hub→auth join and by dst for the
   * auth→hub join (two sorted copies — the bucketed-both-sides trick —
   * so neither direction re-shuffles |E| per round); each half-step
   * shuffles only the fold's contributions and checkpoints a |V|-row
   * raw-score frame (fresh-stats — the loop-cap contract), off which
   * the normalized vector is a cheap projection consumed by both the
   * next half-step and the final output. Nothing data-sized reaches
   * the driver.
   *
   * Caller contract: `edges` non-empty; distinct pairs (internal
   * `distinct()` like [[pageRank]]). Nodes appearing only as src have
   * authority 0; only as dst, hub 0 (the bipartite shape). Output:
   * (node, hub, auth) for every node on either side of an edge.
   */
  def hits(edges: DataFrame, iterations: Int, src: String = "src",
      dst: String = "dst", exact: Boolean = true,
      foldBuckets: Int = 16): DataFrame = {
    val eSrc = checkpointEdges(edges, src, dst)
    // NOT the layout-claimed variant: a claimed eDst removes the shuffle
    // boundary AQE needs to re-plan the per-round joins (whose other side
    // is a mid-derivation state frame with estimate-only stats) into
    // broadcasts — measured +10% on this loop (r14 control A/B); the
    // pagerank-family bases keep the claim because their loop sides are
    // measured-stats leaves that already plan broadcast statically
    val eDst = Caches.checkpointTracked(eSrc
      .repartition(col(dst)).sortWithinPartitions(dst))
    val nodes = Caches.checkpointTracked(
      eSrc.select(col(src).as("node"))
        .unionAll(eSrc.select(col(dst).as("node"))).distinct())
    var hub = nodes.select(col("node"), lit(1.0d).as("hub"))
    var auth = nodes.select(col("node"), lit(1.0d).as("auth"))
    for (_ <- 1 to iterations) {
      val araw = Caches.checkpointTrackedFreshStats(
        nodes.join(foldedContribSum(
            eSrc.join(hub.select(col("node").as(src), col("hub")), src)
              .select(col(dst), col(src), col("hub").as("c")),
            dst, src, exact, foldBuckets),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("s"), lit(0.0d)).as("raw")))
      val amax = araw.agg(max(col("raw"))).collect()(0).getDouble(0)
      require(amax > 0.0, "hits: zero authority mass — no edges reached")
      auth = araw.select(col("node"), (col("raw") / lit(amax)).as("auth"))
      val hraw = Caches.checkpointTrackedFreshStats(
        nodes.join(foldedContribSum(
            eDst.join(auth.select(col("node").as(dst), col("auth")), dst)
              .select(col(src), col(dst), col("auth").as("c")),
            src, dst, exact, foldBuckets),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("s"), lit(0.0d)).as("raw")))
      val hmax = hraw.agg(max(col("raw"))).collect()(0).getDouble(0)
      require(hmax > 0.0, "hits: zero hub mass — no edges reached")
      hub = hraw.select(col("node"), (col("raw") / lit(hmax)).as("hub"))
    }
    hub.join(auth, "node").select(col("node"), col("hub"), col("auth"))
  }

  /**
   * SYNCHRONOUS LABEL PROPAGATION (Raghavan et al. 2007) over a DIRECTED
   * distinct edge list, k fixed rounds — the community-detection
   * completion of the graph toolkit (centrality: [[pageRank]]; local
   * structure: [[triangleStats]]; components: the dedup tier's
   * union-find). Every node starts labeled with its own id; each round
   * it adopts the most frequent label among its IN-neighbors, ties
   * broken by the SMALLEST label — a total order, so the whole k-round
   * trajectory is a pure function of the graph (classic async LPA is
   * run-order dependent; this synchronous deterministic variant is the
   * one an oracle can replay).
   *
   * Caller contract mirrors [[pageRank]]: `edges` distinct (src, dst),
   * every node appears as a dst for in-neighbors to exist (symmetrize
   * for an undirected graph, which guarantees it).
   *
   * Scale shape: the edge list is checkpoint-tracked once (k rounds
   * re-read it); each round is one equi-join (labels onto src) + a
   * partial-aggregated count per (dst, label) + a partial-aggregated
   * `max_by` argmax per dst under the (count, −label) total order — all
   * integers, never a window (the per-node candidate set is bounded by
   * in-degree, but it still lives in aggregates, not per-key sorts),
   * never a cartesian. Output: (node, label) after `iterations` rounds.
   */
  def labelPropagation(edges: DataFrame, iterations: Int,
      src: String = "src", dst: String = "dst"): DataFrame =
    labelPropagationWithBase(edges, iterations, src, dst)._1

  /** [[labelPropagation]] also returning the loop's CHECKPOINTED
    * distinct-edge base — the louvainMoveWithBase idiom: compositions
    * that scan the same graph again after the label phase (modularity's
    * mixing matrix) read the already-materialized base instead of
    * recomputing the upstream edge derivation (for the wired
    * graph_modularity/_q queries, a second lineitem self-join + distinct
    * — measured ~20% of each query). The base's row multiset is exactly
    * `edges.select(src, dst).distinct()`, so substituting it downstream
    * is oracle-neutral. Released with the usual `Caches.releaseAll()`. */
  def labelPropagationWithBase(edges: DataFrame, iterations: Int,
      src: String = "src", dst: String = "dst"): (DataFrame, DataFrame) = {
    val e = checkpointEdges(edges, src, dst)
    val nodes = Caches.checkpointTracked(
      e.select(col(dst).as("node")).distinct())
    val lab0 = nodes.select(col("node"), col("node").as("label"))
    // label-lineage cap every 2nd round (see [[iterate]])
    val labels = iterate(lab0, iterations, capEvery = 2) { (lab, _, cap) =>
      // NO repartition(dst) one-exchange hint here (r15 experiment C):
      // unlike louvainLoop's union shape, the census's map-side partial
      // aggregation collapses the |E| join output well before the
      // exchange, and trading that for one raw |E| shuffle measured a
      // wash (7.0 → 7.3 s) — the two partial-aggregated exchanges stay
      cap(e
        .join(lab.select(col("node").as(src), col("label")), src)
        .groupBy(col(dst), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col(dst))
        .agg(max_by(col("label"),
          struct(col("c"), (-col("label")).as("nl"))).as("label"))
        .select(col(dst).as("node"), col("label")))
    }
    (labels, e)
  }

  /**
   * EXACT k-BOUNDED BFS from a single source over a DIRECTED distinct
   * edge list: hop distance to every node reachable within `maxDepth`
   * steps — the reachability/radius primitive next to [[pageRank]]'s
   * centrality and [[labelPropagation]]'s communities (think "how far
   * does influence travel in the co-purchase graph", ego-network
   * extraction, or the distance feature a ranking model consumes).
   *
   * Level-synchronous frontier expansion, the canonical distributed BFS:
   * level i+1 = (frontier ⋈ edges).dst minus everything already
   * labeled. All integers, and each node's distance is the FIRST level
   * that reaches it — a pure function of the graph, so an oracle replays
   * the loop as a CTE chain. Caller picks the source (collecting a
   * 1-long argmin/min is the caller's bounded job, mirroring
   * [[pageRank]]'s N collect).
   *
   * Scale shape: the edge base is checkpoint-tracked, pre-partitioned
   * and pre-sorted on `src` (the pageRank leaf trick) so each of the k
   * joins re-reads an already-clustered |E| base and only the frontier
   * side moves; the visited set grows monotonically but stays |V|-bounded
   * (node, dist) pairs — the anti-join against it is an equi-join,
   * never a window, never a cartesian, nothing data-sized on the driver.
   * k is a constant; each level is one shuffle of frontier-sized rows —
   * the textbook Pregel BFS cost on a 1000-executor cluster.
   *
   * Output: (node, dist) for every node with dist ≤ maxDepth (the source
   * itself at dist 0). Unreached nodes are absent, not NULL-rowed.
   */
  def bfs(edges: DataFrame, source: Long, maxDepth: Int,
      src: String = "src", dst: String = "dst"): DataFrame =
    bfsLoop(checkpointEdges(edges, src, dst), source, maxDepth, src, dst)

  /** [[bfs]] from the graph's smallest source node — the common
    * "canonical deterministic source" choice. The min runs over the
    * ALREADY-checkpointed edge base, so picking the source costs one
    * cheap |E|-leaf aggregate instead of re-deriving the edge set (the
    * derivation is typically a distinct over a join — measured at sf0.1
    * the re-derivation was ~40% of graph_bfs's whole runtime). */
  def bfsFromMinSource(edges: DataFrame, maxDepth: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val e = checkpointEdges(edges, src, dst)
    val row = e.agg(min(col(src))).head()
    // min() over zero rows aggregates to NULL — fail with a real message
    // instead of the bare NPE getLong would throw on an empty graph
    require(!row.isNullAt(0),
      "bfsFromMinSource: the edge frame is empty — no source node exists")
    bfsLoop(e, row.getLong(0), maxDepth, src, dst)
  }

  private def bfsLoop(e: DataFrame, source: Long, maxDepth: Int,
      src: String, dst: String): DataFrame = {
    // seed node spelled as range.id + source, NOT lit(source): a foldable
    // constant seed lets Catalyst substitute the anti-join's key with the
    // literal, degrading the |frontier| ⋈ dist equi-join to a
    // BroadcastNestedLoopJoin (|frontier|×|V| comparisons — the exact
    // scale-killer the PlanSpec sweep exists to catch; it did)
    val dist0 = e.sparkSession.range(1)
      .select((col("id") + lit(source)).as("node"), lit(0L).as("dist"))
    // TWO SHAPES by wired depth (same rows either way):
    //
    //  - SHALLOW (maxDepth ≤ 4): the fully LAZY loop — levels capped
    //    every 3rd round only, no per-level materialization, no
    //    emptiness probes — so a depth-3 search stays ONE fused job.
    //    Same-host A/B (driver round 13): per-level checkpoints cost
    //    graph_bfs ×1.5 at depth 3, because a probe can only save
    //    rounds a shallow search doesn't have.
    //  - DEEP (maxDepth > 4): the new level is checkpointed EVERY round
    //    and the loop EARLY-EXITS on an empty frontier — a sweep whose
    //    wired depth exceeds the source's real eccentricity stops at the
    //    first empty level instead of paying |E|-join rounds that can
    //    only discover nothing (A/B: graph_diameter_lb 0.32×, its
    //    16-round sweep on an ecc-~6 graph was mostly such rounds). An
    //    empty level leaves the union unchanged and every later level
    //    empty, so the early result is row-identical to the full unroll.
    //
    // The RUNNING union is capped every 3rd round in both shapes:
    // uncapped, round i's anti-join replans against an i-way union of
    // leaves — harmless at the wired depth-4 searches, but the 16-round
    // sweep measured ~20 MINUTES of pure driver planning/bookkeeping at
    // sf0.01 before this cap and ~13 s after — the corenum plan-growth
    // lesson applied to the visited set.
    val (dist, _) =
      if (maxDepth <= 4)
        iterate((dist0, dist0.select("node")), maxDepth,
            capEvery = 3) { case ((dist, frontier), i, cap) =>
          val nxt = cap(
            e.join(frontier.select(col("node").as(src)), src)
              .select(col(dst).as("node")).distinct()
              .join(dist, Seq("node"), "left_anti")
              .select(col("node"), lit(i.toLong).as("dist")))
          (cap(dist.unionAll(nxt)), nxt.select("node"))
        }
      else
        iterateUntil((dist0, dist0.select("node")), maxDepth,
            capEvery = 3) { case ((dist, frontier), i, cap) =>
          val nxt = Caches.checkpointTrackedFreshStats(
            e.join(frontier.select(col("node").as(src)), src)
              .select(col(dst).as("node")).distinct()
              .join(dist, Seq("node"), "left_anti")
              .select(col("node"), lit(i.toLong).as("dist")))
          ((cap(dist.unionAll(nxt)), nxt.select("node")), nxt.isEmpty)
        }
    dist
  }

  /**
   * k-HOP HARMONIC CENTRALITY of a seed set (the harmonic variant of
   * closeness — Boldi & Vigna's choice BECAUSE it is well-defined on
   * disconnected graphs, where classic closeness degenerates):
   * H_k(s) = Σ_{v : 0 < d(s,v) ≤ k} 1/d(s,v), d = BFS hop distance.
   * The k-cap is the operator's semantic, not an approximation knob
   * (the [[bfs]] depth contract): at web scale an uncapped sweep is a
   * full APSP — capped harmonic is what production centrality jobs run.
   *
   * One MULTI-SOURCE loop, frontier keyed by (seed, node) — |S|
   * independent BFS runs would re-join the edge base |S| times per
   * round; keying by seed shares every round's one |E| join across all
   * seeds (the scale shape: per round one equi-join of the
   * |S|·|V|-bounded frontier onto the checkpointed pre-partitioned
   * base, a distinct, and an anti-join against the visited set).
   *
   * Determinism: distances and per-(seed, dist) node counts are exact
   * integers; the only doubles are the ≤ `maxDepth` per-seed fold terms
   * cnt/dist, folded in dist order — fold STATE is maxDepth rows per
   * seed, never |V| (the pageRank collect_list lesson applied to
   * centrality: aggregate the integer census first, fold the tiny
   * census second). An oracle replays the whole thing bit-for-bit.
   *
   * Output: (seed, n_reached, harmonic) — seeds with no out-edges are
   * absent (the [[bfs]] unreached contract). Caller contract: pass a
   * symmetrized edge list for undirected centrality.
   */
  def harmonicCentrality(edges: DataFrame, seeds: Seq[Long], maxDepth: Int,
      src: String = "src", dst: String = "dst"): DataFrame =
    harmonicLoop(checkpointEdges(edges, src, dst), seeds, maxDepth, src, dst)

  /** [[harmonicCentrality]] of the graph's `nSeeds` SMALLEST src nodes —
    * the personalizedPageRankMinSeeds idiom: the seed collect runs over
    * the ALREADY-checkpointed edge leaf (distinct src is an aggregate on
    * the leaf's claimed src layout — exchange-light, nSeeds rows to the
    * driver) instead of a second full edge derivation, which is exactly
    * what the wired graph_closeness query previously paid. Same rows as
    * harmonicCentrality(edges, those seeds) — GraphSpec pins the law. */
  def harmonicCentralityMinSeeds(edges: DataFrame, nSeeds: Int,
      maxDepth: Int, src: String = "src", dst: String = "dst"): DataFrame = {
    val e = checkpointEdges(edges, src, dst)
    harmonicLoop(e, minSrcSeeds(e, nSeeds, src, "harmonicCentralityMinSeeds"),
      maxDepth, src, dst)
  }

  /** The graph's `nSeeds` smallest src nodes off an already-checkpointed
    * edge leaf — one bounded nSeeds-row collect (the ppr seed pattern). */
  private def minSrcSeeds(e: DataFrame, nSeeds: Int, src: String,
      who: String): Seq[Long] = {
    require(nSeeds > 0, s"$who: nSeeds must be > 0")
    val seeds = e.select(col(src)).distinct().orderBy(col(src)).limit(nSeeds)
      .collect().map(_.getLong(0)).toSeq
    require(seeds.size == nSeeds,
      s"$who: graph has only ${seeds.size} src nodes, $nSeeds requested")
    seeds
  }

  private def harmonicLoop(e: DataFrame, seeds: Seq[Long], maxDepth: Int,
      src: String, dst: String): DataFrame = {
    require(seeds.nonEmpty, "harmonicCentrality: empty seed set")
    val spark = e.sparkSession
    import spark.implicits._
    val seed0 = spark.createDataset(seeds).toDF("seed")
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"))
    // Per-level frontier checkpoint + empty-frontier EARLY EXIT and the
    // running-union cap on the bfsLoop cadence (before this the union
    // grew uncapped — safe at the wired depth 6, but the exact
    // plan-growth trap bfsLoop measured at 20 minutes of driver planning
    // on a 16-round sweep): the [[bfsLoop]] rationale, multi-source.
    val (visited, _) = iterateUntil((seed0, seed0.select("seed", "node")),
        maxDepth, capEvery = 3) { case ((vis, frontier), i, cap) =>
      val nxt = Caches.checkpointTrackedFreshStats(
        e.join(frontier.select(col("seed"), col("node").as(src)), src)
          .select(col("seed"), col(dst).as("node")).distinct()
          .join(vis.select("seed", "node"), Seq("seed", "node"), "left_anti")
          .select(col("seed"), col("node"), lit(i.toLong).as("dist")))
      ((cap(vis.unionAll(nxt)), nxt.select("seed", "node")), nxt.isEmpty)
    }
    val census = visited.filter(col("dist") > 0)
      .groupBy("seed", "dist").agg(count(lit(1)).as("cnt"))
    census.groupBy("seed")
      .agg(sum("cnt").as("n_reached"),
        aggregate(sort_array(collect_list(struct(col("dist"), col("cnt")))),
          lit(0.0), (a, s) => a + s.getField("cnt").cast("double")
            / s.getField("dist").cast("double")).as("harmonic"))
  }

  /**
   * TWO-SWEEP DIAMETER LOWER BOUND (the Magnien–Latapy–Habib double-BFS
   * heuristic — the standard way to bound a huge graph's diameter
   * without APSP): BFS from the canonical min source u, take the
   * farthest node w (ties to the smallest id — a total order), BFS
   * again from w; ecc(w) ≥ ecc(u) always (w realizes ecc(u)), and on
   * real graphs the second sweep typically lands the true diameter.
   * Operates within u's component (the bound is for the component the
   * canonical source lives in — cross-component distance is ∞ and not
   * a diameter); `maxDepth` must cover the eccentricities involved —
   * wire the measured value + margin, the corenum contract.
   *
   * All integer (BFS hop distances, one bounded 1-row driver collect
   * for w — the ppr seed pattern), so an oracle replays both sweeps
   * bit-for-bit. Output: one row (u, ecc_u, w, diameter_lb).
   */
  def diameterLowerBound(edges: DataFrame, maxDepth: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val e = checkpointEdges(edges, src, dst)
    val r0 = e.agg(min(col(src))).head()
    require(!r0.isNullAt(0),
      "diameterLowerBound: the edge frame is empty — no source node exists")
    val u = r0.getLong(0)
    val d1 = bfsLoop(e, u, maxDepth, src, dst)
    val wRow = d1.agg(
      max_by(col("node"), struct(col("dist"), (-col("node")).as("nn"))).as("w"),
      max(col("dist")).as("ecc")).head()
    val (w, ecc) = (wRow.getLong(0), wRow.getLong(1))
    bfsLoop(e, w, maxDepth, src, dst)
      .agg(max(col("dist")).as("diameter_lb"))
      .select(lit(u).as("u"), lit(ecc).as("ecc_u"), lit(w).as("w"),
        col("diameter_lb"))
  }

  /**
   * SEED-PAIR STRESS CENTRALITY (Shimbel 1953 — betweenness's
   * integer-valued ancestor, and the Brandes-style path-counting
   * machinery behind it): for every node v, the number of shortest
   * paths BETWEEN seed pairs that pass through v —
   * stress(v) = Σ_{s<t ∈ S} σ_st(v), where σ_st(v) = σ_s(v)·σ_t(v)
   * when d_s(v) + d_t(v) = d(s, t) (v lies on a shortest s-t path) and
   * 0 otherwise. Exact betweenness needs this same σ machinery plus a
   * double-valued dependency accumulation (σ ratios — a per-round
   * DOUBLE SUM, partition-order nondeterministic); the stress form
   * keeps the whole computation in exact integers, which is what makes
   * the row oracle-replayable — and seed-PAIR restriction is the
   * standard production sampling anyway (full betweenness is APSP).
   *
   * σ via multi-source BFS with path counting: σ(seed, v at dist i) =
   * Σ over frontier predecessors u of σ(seed, u) — every predecessor of
   * a dist-i node sits at dist i−1 (the BFS property), so one
   * partial-agg integer sum per round is the whole recurrence. The
   * loop is [[harmonicCentrality]]'s multi-source shape with a σ
   * payload: per round one |E| equi-join of the frontier onto the
   * checkpointed base, a (seed, node) sum, an anti-join. Path counts
   * are exact BIGINTs; a graph whose shortest-path counts overflow 2⁶³
   * (astronomically redundant mesh at depth k) needs the log-space /
   * sampled variant — documented, not wired.
   *
   * The pair combine: seed-pair distances d(s,t) come from the visited
   * frame itself (seed rows landing on seed nodes — no driver round
   * trip); through-counts are two equi-joins of the |S|·|V| visited
   * frame (a-side keyed by s, b-side by (t, node)) against the ≤C(|S|,2)
   * broadcast pair frame, filtered by the distance identity, then one
   * partial-agg integer sum per node. Output: (node, stress) for nodes
   * with stress > 0, seeds excluded per pair by definition.
   */
  def stressCentrality(edges: DataFrame, seeds: Seq[Long], maxDepth: Int,
      src: String = "src", dst: String = "dst"): DataFrame =
    stressLoop(checkpointEdges(edges, src, dst), seeds, maxDepth, src, dst)

  /** [[stressCentrality]] of the graph's `nSeeds` SMALLEST src nodes —
    * the harmonicCentralityMinSeeds rationale verbatim (seed collect off
    * the checkpointed leaf instead of a second edge derivation). Same
    * rows as stressCentrality(edges, those seeds). */
  def stressCentralityMinSeeds(edges: DataFrame, nSeeds: Int, maxDepth: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val e = checkpointEdges(edges, src, dst)
    stressLoop(e, minSrcSeeds(e, nSeeds, src, "stressCentralityMinSeeds"),
      maxDepth, src, dst)
  }

  private def stressLoop(e: DataFrame, seeds: Seq[Long], maxDepth: Int,
      src: String, dst: String): DataFrame = {
    require(seeds.nonEmpty, "stressCentrality: empty seed set")
    val spark = e.sparkSession
    import spark.implicits._
    val seed0 = spark.createDataset(seeds).toDF("seed")
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"),
        lit(1L).as("sigma"))
    // Per-level frontier checkpoint + empty-frontier EARLY EXIT and the
    // running-union cap — the [[harmonicCentrality]] / [[bfsLoop]]
    // rationale with the σ payload riding along.
    val (visRaw, _) = iterateUntil(
        (seed0, seed0.select("seed", "node", "sigma")),
        maxDepth, capEvery = 3) { case ((vis, frontier), i, cap) =>
      val nxt = Caches.checkpointTrackedFreshStats(
        e.join(frontier.select(col("seed"), col("node").as(src),
            col("sigma")), src)
          .groupBy(col("seed"), col(dst).as("node"))
          .agg(sum("sigma").as("sigma"))
          .join(vis.select("seed", "node"), Seq("seed", "node"), "left_anti")
          .select(col("seed"), col("node"), lit(i.toLong).as("dist"),
            col("sigma")))
      ((cap(vis.unionAll(nxt)), nxt.select("seed", "node", "sigma")),
        nxt.isEmpty)
    }
    // the visited frame feeds the pair frame AND both combine legs
    val vis = Caches.persistTracked(visRaw)
    val pairD = vis
      .filter(col("node").isin(seeds: _*) && col("seed") < col("node"))
      .select(col("seed").as("s"), col("node").as("t"), col("dist").as("d"))
    vis.select(col("seed").as("s"), col("node"),
        col("dist").as("da"), col("sigma").as("sa"))
      .join(broadcast(pairD), "s")
      .join(vis.select(col("seed").as("t"), col("node"),
        col("dist").as("db"), col("sigma").as("sb")), Seq("t", "node"))
      .filter(col("da") + col("db") === col("d") &&
        col("node") =!= col("s") && col("node") =!= col("t"))
      .groupBy("node")
      .agg(sum(col("sa") * col("sb")).as("stress"))
  }

  /**
   * SINGLE-SOURCE SHORTEST PATHS, k-bounded (Bellman–Ford rounds) over a
   * DIRECTED edge list with POSITIVE INTEGER weights — the distance
   * completion of [[bfs]]'s reachability (bfs answers "how many hops";
   * sssp answers "how cheap", e.g. over a co-purchase graph whose edge
   * cost falls with co-occurrence strength). After k rounds every node
   * holds the exact cheapest cost over paths of ≤ k edges — a pure
   * integer min-plus recurrence, so the whole trajectory is a pure
   * function of the graph and an oracle replays it as a CTE chain
   * bit-for-bit (no floating point anywhere).
   *
   * Round i: relax every edge out of the current distance frame
   * (dist ⋈ edges → dst, d + w), union with the standing distances, and
   * take the per-node integer `min` — a partial-aggregated groupBy
   * (map-side combine collapses candidates before the shuffle), never a
   * window, never a cartesian. The distance frame stays |V|-bounded;
   * the |E| base is checkpoint-tracked, pre-partitioned and pre-sorted
   * on `src` (the [[iterate]] scaffold's standard leaf) so only the
   * |V|-row side moves per round. Unreached nodes are absent, not
   * NULL-rowed (the [[bfs]] contract).
   *
   * Output: (node, cost) for every node reachable within `maxRounds`
   * edges (the source itself at cost 0).
   */
  def sssp(edges: DataFrame, source: Long, maxRounds: Int,
      src: String = "src", dst: String = "dst", weight: String = "w"):
      DataFrame =
    ssspLoop(checkpointWeightedEdges(edges, src, dst, weight), source,
      maxRounds)

  /** [[sssp]] from the graph's smallest source node (the
    * [[bfsFromMinSource]] convention): the min runs over the ALREADY
    * checkpointed weighted base, so picking the source costs one cheap
    * |E|-leaf aggregate instead of re-deriving the edge set. */
  def ssspFromMinSource(edges: DataFrame, maxRounds: Int,
      src: String = "src", dst: String = "dst", weight: String = "w"):
      DataFrame = {
    val e = checkpointWeightedEdges(edges, src, dst, weight)
    val row = e.agg(min(col("s"))).head()
    require(!row.isNullAt(0),
      "ssspFromMinSource: the edge frame is empty — no source node exists")
    ssspLoop(e, row.getLong(0), maxRounds)
  }

  /** Name-normalized (s, d, w) weighted edge leaf, pre-partitioned and
    * pre-sorted by the per-round join key (the [[checkpointEdges]]
    * shape). */
  private def checkpointWeightedEdges(edges: DataFrame, src: String,
      dst: String, weight: String): DataFrame =
    Caches.checkpointTrackedLayout(
      edges.select(col(src).as("s"), col(dst).as("d"),
        col(weight).cast("bigint").as("w")),
      hashCols = Seq("s"), sortCols = Seq("s"))

  private def ssspLoop(e: DataFrame, source: Long, maxRounds: Int):
      DataFrame = {
    // the bfs seed trick: a non-foldable seed keeps the per-round joins
    // equi-joins instead of literal-substituted nested loops
    val dist0 = e.sparkSession.range(1)
      .select((col("id") + lit(source)).as("node"), lit(0L).as("cost"))
    // The whole distance frame re-aggregates each round (min over
    // union), so the running state is the right leaf to truncate — and
    // with [[iterateUntil]] it is capped EVERY round so the
    // exact-fixpoint check (no relaxation improved any cost: the
    // Bellman–Ford termination condition) is one bounded job against two
    // materialized |V| frames. At dist_t = dist_{t-1} every later round
    // relaxes to the same minima, so the early result is row-identical.
    // MONOTONE fixpoint check (r16, replaces the per-round full-outer
    // stateUnchanged join): the reached set only GROWS (next unions dist
    // in) and every cost only relaxes DOWNWARD (min over the union), so
    // equal (count, Σcost) across rounds is frame equality — see
    // countSumFingerprint. Bellman–Ford termination, one scalar job.
    var fp = (-1L, -1L)
    iterateUntil(dist0, maxRounds, capEvery = 1) { (dist, _, cap) =>
      val relaxed = e
        .join(dist.select(col("node").as("s"), col("cost")), "s")
        .select(col("d").as("node"), (col("cost") + col("w")).as("cost"))
      val next = cap(dist.unionAll(relaxed)
        .groupBy("node").agg(min("cost").as("cost")))
      val nfp = countSumFingerprint(next, "cost")
      val done = nfp == fp
      fp = nfp
      (next, done)
    }
  }

  /** One-row exact summary of the undirected graph given by (`src`,`dst`)
    * pairs (self-loops dropped, parallel/reversed duplicates collapsed):
    * n_nodes, n_edges, n_wedges (= Σ_v C(deg v, 2)), n_triangles, and
    * clustering = 3·triangles / wedges (NULL on a wedge-free graph). */
  def triangleStats(edges: DataFrame, src: String = "src",
      dst: String = "dst"): DataFrame = {
    // The canonical edge set and the oriented edge set are each consumed
    // by SEVERAL downstream subtrees, so both materialize EAGERLY as
    // lineage-truncated leaves (checkpointTracked): a mere cache entry
    // keeps the full derivation in every referencing subtree — measured
    // on the sf0.1 co-occurrence graph, the resulting ~25-stage /
    // 600-task plan ran 7.5 s where this two-leaf shape runs ~2 s for
    // the identical answer. The caller releases both via
    // Caches.releaseAll() after materializing (the standard contract).
    val e = Caches.checkpointTracked(edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct())
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // ONE aggregate yields |V|, |E| (= Σdeg/2, exactly — every edge
    // contributes 2 degree), and Σ C(deg, 2); deg·(deg−1) is even, so
    // both integer divisions are exact
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    // orient each edge toward the higher (deg, id); carry the head's
    // degree — the wedge join orders the two heads by the same key
    val lt = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val or = Caches.checkpointTracked(e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(
        when(lt, col("a")).otherwise(col("b")).as("u"),
        when(lt, col("b")).otherwise(col("a")).as("v"),
        when(lt, col("db")).otherwise(col("da")).as("dv")))
    val x = or.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
    val y = or.select(col("u"), col("v").as("v2"), col("dv").as("d2"))
    val wedges = x.join(y, Seq("u"))
      .filter((col("d1") < col("d2")) ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
    val triStats = wedges
      .join(or.select(col("u").as("v1"), col("v").as("v2")),
        Seq("v1", "v2"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    nodeStats.crossJoin(triStats)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise((col("n_triangles") * lit(3)).cast("double") /
            col("n_wedges").cast("double")).as("clustering"))
  }

  /**
   * COMMON-NEIGHBOR LINK PREDICTION (Liben-Nowell & Kleinberg 2003) —
   * the classic structural recommender: for every DISTANCE-2 NON-EDGE
   * (a, b) (nodes that share ≥ 1 neighbor but are not themselves
   * connected), score the missing edge by its common-neighbor count and
   * the neighborhood Jaccard |Γa ∩ Γb| / |Γa ∪ Γb|, and return the
   * top-k predictions. On a co-purchase graph this is "customers also
   * bought these two together-adjacent parts — they will co-occur
   * next"; on a document-similarity graph it is the candidate-pair
   * generator for a second dedup pass.
   *
   * Determinism: cn and the degrees are exact integers; jaccard is ONE
   * IEEE division of integers (bit-equal in any engine); ranking by
   * (jaccard DESC, a, b) is a total order → TakeOrderedAndProject.
   *
   * Scale shape: wedges enumerate via the symmetrized adjacency
   * self-joined on the MIDDLE node — cost Σ_m C(deg(m), 2), the same
   * bound the triangle census pays, partial-aggregated per candidate
   * pair before the anti-join (no pair list ever materializes
   * unaggregated). The anti-join and the two degree joins run on the
   * candidate set (≪ wedges). On a graph with super-hubs, cap the
   * middle degree first (common neighbors through a hub carry ~zero
   * signal — the reason Adamic–Adar down-weights them); the wired
   * query's strong co-purchase graph is hub-free by construction, so
   * no cap is applied there. Edges canonicalize/dedup internally
   * (triangleStats' contract); `e` and `adj` checkpoint as shared
   * leaves (each feeds 2–3 subtrees), released by the caller's
   * Caches.releaseAll().
   */
  def linkPrediction(edges: DataFrame, topK: Int, src: String = "src",
      dst: String = "dst"): DataFrame = {
    val e = Caches.checkpointTracked(edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct())
    val adj = Caches.checkpointTracked(
      e.select(col("a").as("m"), col("b").as("x"))
        .unionAll(e.select(col("b").as("m"), col("a").as("x"))))
    val deg = adj.groupBy(col("m").as("n")).agg(count(lit(1)).as("deg"))
    val cn = adj.as("l")
      .join(adj.as("r"), col("l.m") === col("r.m") && col("l.x") < col("r.x"))
      .groupBy(col("l.x").as("a"), col("r.x").as("b"))
      .agg(count(lit(1)).as("cn"))
    cn.join(e, Seq("a", "b"), "left_anti")
      .join(deg.select(col("n").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a").as("item_a"), col("b").as("item_b"), col("cn"),
        col("deg_a"), col("deg_b"),
        (col("cn").cast("double") /
          (col("deg_a") + col("deg_b") - col("cn")).cast("double"))
          .as("jaccard"))
      .orderBy(desc("jaccard"), col("item_a"), col("item_b"))
      .limit(topK)
  }

  /**
   * ADAMIC–ADAR LINK PREDICTION (Adamic & Adar 2003) — [[linkPrediction]]
   * with the hub-discounted score: each common neighbor m contributes
   * 1/ln(deg(m)) instead of 1, so predictions through promiscuous hubs
   * are down-weighted exactly as the measure prescribes (the analytic
   * answer to the hub-cap note on the Jaccard face). A wedge middle
   * always has deg ≥ 2, so ln(deg) ≥ ln 2 > 0 — the division is total.
   *
   * Determinism: deg is an exact integer; each contribution is ONE fixed
   * expression 1.0/ieee_ln(deg) ([[graft.expressions.Ieee754Ln]] — the
   * libm-matching ln, so the DuckDB replay is bit-exact); the per-pair
   * sum folds contributions in MIDDLE-NODE ORDER (sort_array over the
   * pair's middle list — bounded by min(deg a, deg b)); ranking
   * (aa DESC, a, b) is a total order. Same wedge bound and candidate
   * anti-join as the Jaccard face.
   */
  def linkPredictionAdamicAdar(edges: DataFrame, topK: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val e = Caches.checkpointTracked(edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct())
    val adj = Caches.checkpointTracked(
      e.select(col("a").as("m"), col("b").as("x"))
        .unionAll(e.select(col("b").as("m"), col("a").as("x"))))
    val deg = adj.groupBy(col("m").as("n")).agg(count(lit(1)).as("deg"))
    val wedges = adj.as("l")
      .join(adj.as("r"), col("l.m") === col("r.m") && col("l.x") < col("r.x"))
      .select(col("l.x").as("a"), col("r.x").as("b"), col("l.m").as("m"))
      .join(deg.select(col("n").as("m"), col("deg").as("dm")), "m")
    val aa = wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        aggregate(sort_array(collect_list(struct(col("m"), col("dm")))),
          lit(0.0),
          (acc, s) => acc + lit(1.0) /
            graft.functions.TextFunctions.ieeeLn(s.getField("dm").cast("double")))
          .as("aa"))
    aa.join(e, Seq("a", "b"), "left_anti")
      .select(col("a").as("item_a"), col("b").as("item_b"), col("cn"),
        col("aa"))
      .orderBy(desc("aa"), col("item_a"), col("item_b"))
      .limit(topK)
  }

  /**
   * K-TRUSS PEELING TRAJECTORY (Cohen 2008) — the triangle-cohesion
   * strengthening of k-core: iteratively delete every edge supported by
   * fewer than k−2 triangles in the CURRENT subgraph, until stable. An
   * edge survives only inside densely interlocked neighborhoods, which
   * makes the truss the community-core extractor where k-core still
   * admits stars. Output is the whole PEELING TRAJECTORY — one row
   * (round, n_edges) per synchronous round — so the oracle certifies
   * every round's edge census, not just the fixpoint (and the row stays
   * meaningful on graphs whose truss empties).
   *
   * Per round: one degree-oriented triangle enumeration over the
   * surviving subgraph (the [[triangleStats]] O(m^1.5) wedge shape —
   * never the naive Σ deg² expansion), each triangle attributing
   * support to its THREE canonical edges, a partial-agg count per edge,
   * and an inner join keeping edges at support ≥ k−2 (k ≥ 3, so the
   * threshold is ≥ 1 and unsupported edges drop by the join itself).
   * State is lineage-capped per round with FRESH stats
   * ([[Caches.checkpointTrackedFreshStats]] — the round-11 estimate-
   * compounding lesson). `rounds` is the caller's measured fixpoint
   * (+1 idempotent margin — the corenum/MIS contract).
   */
  def kTrussTrajectory(edges: DataFrame, k: Int, rounds: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    var cur = Caches.checkpointTracked(edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct())
    val counts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    (1 to rounds).foreach { r =>
      val deg = cur.select(col("a").as("n")).unionAll(cur.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val lt = (col("da") < col("db")) ||
        (col("da") === col("db") && col("a") < col("b"))
      val or = Caches.checkpointTracked(cur
        .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
        .select(
          when(lt, col("a")).otherwise(col("b")).as("u"),
          when(lt, col("b")).otherwise(col("a")).as("v"),
          when(lt, col("db")).otherwise(col("da")).as("dv")))
      val x = or.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
      val y = or.select(col("u"), col("v").as("v2"), col("dv").as("d2"))
      val tri = x.join(y, Seq("u"))
        .filter((col("d1") < col("d2")) ||
          (col("d1") === col("d2") && col("v1") < col("v2")))
        .join(or.select(col("u").as("v1"), col("v").as("v2")),
          Seq("v1", "v2"), "left_semi")
        .select(col("u"), col("v1"), col("v2"))
      val roles = tri.select(least(col("u"), col("v1")).as("a"),
          greatest(col("u"), col("v1")).as("b"))
        .unionAll(tri.select(least(col("u"), col("v2")).as("a"),
          greatest(col("u"), col("v2")).as("b")))
        .unionAll(tri.select(least(col("v1"), col("v2")).as("a"),
          greatest(col("v1"), col("v2")).as("b")))
      val sup = roles.groupBy("a", "b").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= (k - 2).toLong)
      cur = Caches.checkpointTrackedFreshStats(
        cur.join(sup.select("a", "b"), Seq("a", "b"), "left_semi"))
      counts += cur.agg(count(lit(1)).as("n_edges"))
        .select(lit(r.toLong).as("round"), col("n_edges"))
    }
    counts.reduce(_ unionAll _)
  }

  /**
   * INCREMENTAL TRIANGLE COUNT under an edge Δ-batch — the third
   * graph-IVM face (components: quotient contraction; degrees: additive
   * merge; triangles: Δ-ANCHORED WEDGE CLOSURE):
   *
   *   T(base ∪ Δ) = T(base) + |{triangles with ≥ 1 genuinely-new edge}|
   *
   * and every triangle in the second set contains a Δ edge, so it is
   * found by probing the merged adjacency ONLY from Δ anchors — for
   * each new edge (a, b), the common neighbors of a and b. Cost is
   * Σ_δ (deg(a) + deg(b)) adjacency rows joined per batch, where a
   * recount pays the full degree-orientation + Σ C(deg, 2) wedge
   * census again; base edges are read (the probe needs the adjacency —
   * inherent to triangle maintenance) but never re-censused.
   * Double-count safety: Δ edges already present in the base are
   * dropped first (an anti-join — a replayed edge closes no NEW
   * triangle), and a new triangle with 2 or 3 Δ edges is found once
   * per Δ anchor, so the found triples are canonicalized (sorted) and
   * de-duplicated before counting. The `graph_triangles_ivm` oracle
   * recomputes both counts from scratch — the hash match is the
   * decomposition theorem.
   *
   * `baseCount`: the stored 1-row view, column `n_triangles` (as
   * [[triangleStats]] emits). `baseEdges`/`deltaEdges`: undirected
   * edge lists in any orientation (canonicalized and de-duplicated
   * internally, self-loops dropped — triangleStats' contract). Output:
   * one row (n_triangles, new_triangles).
   */
  def trianglesIncremental(baseCount: DataFrame, baseEdges: DataFrame,
      deltaEdges: DataFrame, src: String = "src",
      dst: String = "dst"): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val bd = Caches.persistTracked(canon(baseEdges))
    // genuinely-new edges only: a Δ edge already in the base closes no
    // new triangle (and double-counting it would corrupt the view)
    val dd = Caches.persistTracked(
      canon(deltaEdges).join(bd, Seq("a", "b"), "left_anti"))
    val adj = bd.unionAll(dd)
      .select(col("a").as("s"), col("b").as("t"))
      .unionAll(bd.unionAll(dd).select(col("b").as("s"), col("a").as("t")))
    // wedges anchored at a Δ edge: common neighbors of its endpoints in
    // the MERGED adjacency (w = a or b is impossible — no self-loops)
    val triples = dd
      .join(adj.select(col("s").as("a"), col("t").as("w")), "a")
      .join(adj.select(col("s").as("b"), col("t").as("w")), Seq("b", "w"))
      .select(least(col("a"), col("b"), col("w")).as("x"),
        // median of three via min/max only — overflow-safe on any ids
        greatest(least(col("a"), col("b")),
          least(greatest(col("a"), col("b")), col("w"))).as("y"),
        greatest(col("a"), col("b"), col("w")).as("z"))
      .dropDuplicates("x", "y", "z")
    val newCount = triples.agg(count(lit(1)).as("new_triangles"))
    baseCount.select(col("n_triangles").as("base_triangles"))
      .crossJoin(broadcast(newCount))
      .select((col("base_triangles") + col("new_triangles"))
        .as("n_triangles"), col("new_triangles"))
  }

  /**
   * MAXIMAL INDEPENDENT SET — Luby's algorithm (1986), the
   * deterministic synchronous variant: every node gets a FIXED
   * pseudo-random priority p(v) = ((v mod P) · 48271) mod P with
   * P = 2³¹ − 1 (the MINSTD multiplicative generator — one modular
   * multiply, products < 2⁴⁷ so the arithmetic is exact BIGINT in any
   * engine, which is what lets a DuckDB oracle replay it; ties broken
   * by node id → a total order). Per round, every still-undecided node
   * simultaneously joins the MIS iff its (p, id) key is strictly
   * smaller than every still-undecided neighbor's; neighbors of new
   * members become dominated; both leave the undecided set. Classic
   * Luby terminates in O(log n) rounds w.h.p.; this runs FIXED
   * `rounds` (the LPA/kcore contract — the trajectory is a pure
   * function of the graph) and reports the residue honestly.
   *
   * The MIS is the graph-toolkit face of DIVERSITY SAMPLING: on a
   * similarity/co-occurrence graph, a maximal set of mutually
   * non-adjacent items — "pick a covering subset with no two near
   * neighbors", the subset-selection primitive a curation pipeline
   * runs after near-dup detection.
   *
   * Caller contract: symmetrized distinct edges, no self-loops (the
   * [[kCore]] convention). Output: (node, status) for every node in
   * the edge list — status 2 = in the MIS, 1 = dominated (has an MIS
   * neighbor), 0 = still undecided after `rounds` (none at a
   * fixpoint; by construction the status-2 set is independent and,
   * once nothing is undecided, maximal — GraphSpec pins both laws and
   * the wired fixpoint).
   *
   * Scale shape per round: one |E| equi-join of the undecided set onto
   * the checkpointed pre-sorted edge base + a degree-bounded
   * partial-agg `min(struct)` per node (never a window), one more |E|
   * join to mark dominated neighbors, and |V|-row set subtractions;
   * state is the |V|-row status frame, lineage-capped every 2nd round.
   */
  def maximalIndependentSet(edges: DataFrame, rounds: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val P = 2147483647L
    def prio(c: Column): Column = pmod(pmod(c, lit(P)) * lit(48271L), lit(P))
    val e = checkpointEdges(edges, src, dst)
    val nodes = Caches.checkpointTracked(
      e.select(col(src).as("node")).distinct())
    val s0 = nodes.select(col("node"), lit(0L).as("status"))
    // EARLY EXIT on an empty undecided set ([[iterateUntil]]): once every
    // node is MIS or dominated, each remaining wired margin round would
    // still pay two |E| joins to select nothing and rebuild an identical
    // status frame. `und` filters the (capped-every-round, materialized)
    // state, so the emptiness probe is one bounded job; und = ∅ makes the
    // round — and by induction all later rounds — the identity on the
    // status frame, so the output is row-identical to the full unroll.
    iterateUntil(s0, rounds, capEvery = 1) { (st, _, cap) =>
      val und = st.filter(col("status") === 0L).select("node")
      if (und.isEmpty) (st, true) else {
      // min (p, id) among each undecided node's undecided neighbors
      val nbrMin = e
        .join(und.select(col("node").as(src)), src)
        .join(und.select(col("node").as(dst)), dst)
        .groupBy(col(dst).as("node"))
        .agg(min(struct(prio(col(src)).as("p"), col(src).as("u")))
          .as("nm"))
      val newMis = und
        .join(nbrMin, Seq("node"), "left")
        .filter(col("nm").isNull ||
          (struct(prio(col("node")).as("p"), col("node").as("u"))
            < col("nm")))
        .select("node")
      val dominated = e
        .join(newMis.select(col("node").as(src)), src)
        .select(col(dst).as("node")).distinct()
        .join(und, Seq("node"), "left_semi")
      (cap(st
        .join(newMis.withColumn("mis", lit(true)), Seq("node"), "left")
        .join(dominated.withColumn("dom", lit(true)), Seq("node"), "left")
        .select(col("node"),
          when(col("status") =!= 0L, col("status"))
            .when(col("mis"), lit(2L))
            .when(col("dom"), lit(1L))
            .otherwise(lit(0L)).as("status"))), false)
      }
    }
  }

  /**
   * k-CORE PEELING, `rounds` synchronous rounds (Seidman 1983; the
   * Batagelj–Zaveršnik cores by repeated low-degree removal) over a
   * SYMMETRIZED distinct edge list — the density-curation primitive of
   * the toolkit (pageRank ranks, LPA groups, k-core PRUNES: "keep the
   * subgraph where everything has ≥ k supported neighbors", the
   * standard spam/fringe filter before any expensive per-node work).
   *
   * Caller contract: pass BOTH directions of each undirected edge (the
   * [[pageRank]] convention), distinct, no self-loops.
   *
   * Each round recomputes every surviving node's degree WITHIN the
   * surviving subgraph and drops all nodes under k simultaneously —
   * the synchronous variant, so the whole trajectory is a pure function
   * of (graph, k, rounds) and an oracle replays it as a CTE chain (all
   * integers, nothing to round). At a fixpoint the survivors are exactly
   * the k-core; with bounded rounds the output is the r-round peel
   * (deterministic either way — the oracle replays the same r).
   *
   * Scale shape: the |E| base is checkpoint-tracked, pre-partitioned on
   * `src` (the [[iterate]] leaf); each round is two semi-shaped
   * equi-joins onto the |V|-bounded survivor frame + one
   * partial-aggregated count — never a window, never a cartesian,
   * per-key state bounded. The survivor frame only shrinks.
   *
   * Output: (node, deg) for every node surviving `rounds` peels, deg =
   * its degree in the round's input subgraph (≥ k by construction).
   */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val e = checkpointEdges(edges, src, dst)
    val s0 = Caches.checkpointTracked(
      e.select(col(src).as("node")).distinct())
    val d0 = s0.select(col("node"), lit(0L).as("deg"))
    // EXACT-FIXPOINT EARLY EXIT: peeling strictly shrinks the survivor
    // set until the k-core is reached, after which every wired margin
    // round recomputes an identical (node, deg) frame from two |E| joins.
    // The capped-every-round frame makes the equality check one bounded
    // job, and deg_t = deg_{t-1} implies all later peels are no-ops.
    // MONOTONE fixpoint check (r16): peeling only SHRINKS the survivor
    // set (keys(deg_t) ⊆ surv_{t-1}), so equal survivor COUNTS across
    // rounds force equal survivor sets, and round t+1 then recomputes
    // deg on the identical subgraph — the output is row-identical to the
    // old full-frame stateUnchanged protocol (which ran exactly one more
    // identity round before noticing). One count() on the already-capped
    // leaf replaces the per-round |V|⋈|V| full-outer join.
    var prevCount = -1L
    val (_, out) = iterateUntil((s0, d0), rounds, capEvery = 1) {
      case ((surv, _), _, cap) =>
        // inner equi-joins against the UNIQUE survivor nodes ≡ left-semi
        // (no fan-out possible) but keep the planner free to reorder
        val deg = cap(e
          .join(surv.select(col("node").as(src)), src)
          .join(surv.select(col("node").as(dst)), dst)
          .groupBy(col(src).as("node"))
          .agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k))
        val c = deg.count()
        val done = c == prevCount
        prevCount = c
        ((deg.select("node"), deg), done)
    }
    out
  }

  /**
   * CORE-NUMBER DECOMPOSITION (coreness per node) via the H-INDEX
   * ITERATION (Lü, Zhou, Zhang, Stanley 2016, "The H-index of a network
   * node and its relation to degree and coreness"): h₀(v) = deg(v),
   * hₜ₊₁(v) = h-index of {hₜ(u) : u ∈ N(v)} — provably monotonically
   * non-increasing and convergent to EXACTLY the k-core number of v.
   * The per-k completion of [[kCore]] (which answers "who survives the
   * k-core?" for ONE k; this answers "what is every node's maximal k?"
   * in one pass) — chosen over peel-with-increasing-k because peeling
   * nests two loops (levels × rounds-to-fixpoint, an unrolled oracle of
   * hundreds of CTEs at this corpus's degeneracy 15), where the h-index
   * recurrence is ONE loop of pure integer joins.
   *
   * Caller contract: both directions of each undirected edge, distinct,
   * no self-loops (the [[kCore]] convention). With bounded `rounds` the
   * output is the r-round h-index estimate — a pure function of
   * (graph, r) both engines replay identically; at a fixpoint it IS the
   * coreness (GraphSpec pins the wired round count as a fixpoint at the
   * gate SFs by checking one extra round is a no-op, and the estimate
   * only ever OVERSHOOTS coreness, never under).
   *
   * The h-index is computed WITHOUT per-node neighbor arrays (the
   * pagerank collect_list lesson): h-index(v) = max{k : |{u ∈ N(v) :
   * hₜ(u) ≥ k}| ≥ k}, so each edge (v,u) emits candidate thresholds
   * k = 1..min(hₜ(v), hₜ(u)) (truncation by hₜ(v) is lossless BECAUSE
   * the iteration is non-increasing), then a partial-aggregated
   * count per (node, k), filter count ≥ k, max(k) per node. The
   * explosion is bounded by the LOWER endpoint's h-value — the
   * Chiba–Nishizeki orientation bound, Σ_edges min(h) = O(α·|E|) with
   * α the arboricity — so a 10⁷-degree hub's edges fan out by their
   * low-degree endpoints' values, never by the hub's. All integers;
   * per-aggregation-key state is a single count/max — bounded.
   *
   * Scale shape: the |E| base is checkpoint-tracked pre-partitioned on
   * `src` ([[iterate]] leaf); each round is two equi-joins of the
   * |V|-bounded h-frame onto it + two partial aggregations; lineage
   * capped every 2nd round. Nodes whose neighbors all reach h = 0
   * coalesce to 0 via the left join from the node universe.
   *
   * Output: (node, core) for every node in the edge list — core = the
   * r-round h-index value (= coreness once converged).
   */
  def coreNumbers(edges: DataFrame, rounds: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val e = checkpointEdges(edges, src, dst)
    val h0 = Caches.checkpointTracked(
      e.groupBy(col(src).as("node")).agg(count(lit(1)).as("h")))
    // EXACT-FIXPOINT EARLY EXIT ([[iterateUntil]]): the h-index iteration
    // is monotonically non-increasing and converges in ~O(graph depth)
    // rounds (sf0.1 measured: 4) while `rounds` wires a 20-round safety
    // margin — before this, every idempotent round still paid its |E|
    // joins + threshold explode. The state is capped EVERY round so the
    // equality check compares two materialized |V| frames (one bounded
    // job); at h_t = h_{t-1} every later round is a no-op by purity, so
    // the early result is row-identical to the full unroll and the
    // 20-round oracle CTE chain still hash-matches.
    // MONOTONE fixpoint check (r16): the h-index iteration is pointwise
    // NON-INCREASING over a FIXED node universe (the coalesce-0 left
    // join from h0's keys), so an unchanged (count, Σh) fingerprint
    // forces every h equal — countSumFingerprint's argument. One scalar
    // job per round replaces the |V|⋈|V| full-outer stateUnchanged join.
    var fp = (-1L, -1L)
    iterateUntil(h0, rounds, capEvery = 1) { (h, _, cap) =>
      val cand = e
        .join(h.select(col("node").as(src), col("h").as("ha")), src)
        .join(h.select(col("node").as(dst), col("h").as("hb")), dst)
        // Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty —
        // drop zero-h endpoints before exploding the threshold range
        .filter(least(col("ha"), col("hb")) >= 1)
        .select(col(src).as("node"),
          explode(sequence(lit(1L), least(col("ha"), col("hb")))).as("k"))
      val hm = cand.groupBy("node", "k").agg(count(lit(1)).as("c"))
        .filter(col("c") >= col("k"))
        .groupBy("node").agg(max(col("k")).as("h"))
      val next = cap(h0.select("node").join(hm, Seq("node"), "left")
        .select(col("node"), coalesce(col("h"), lit(0L)).as("h")))
      val nfp = countSumFingerprint(next, "h")
      val done = nfp == fp
      fp = nfp
      (next, done)
    }.select(col("node"), col("h").as("core"))
  }

  /**
   * CONNECTED COMPONENTS over an arbitrary edge list: (node, component)
   * for every node appearing in some edge, component = min node id of
   * its component — the graph-toolkit face of the dedup tier's
   * union-find ([[Dedup.duplicateClusters]]' pointer-jumping min-label
   * RDD loop: O(log diameter) rounds, co-partitioned narrow joins,
   * per-round lineage cuts, every loop cache released in try/finally).
   * The min-label fixpoint is iteration-order independent, so the result
   * is a pure function of the graph and a recursive-CTE oracle replays
   * it (the fuzzy_clusters argument).
   *
   * Input edges may be directed pairs — the union-find symmetrizes
   * internally (connectivity is an undirected notion). The returned
   * frame is [[Caches]]-registered (the duplicateClusters contract);
   * callers release via `Caches.releaseAll()` once consumed.
   */
  def connectedComponents(edges: DataFrame, src: String = "src",
      dst: String = "dst", loopParts: Int = 0,
      localPairsCap: Long = 0L): DataFrame =
    Dedup.duplicateClusters(
      edges.select(col(src).as("doc_a"), col(dst).as("doc_b")),
      loopParts = loopParts, localPairsCap = localPairsCap)
      .select(col("doc_id").as("node"), col("cluster").as("component"))

  /**
   * INCREMENTAL connected-component maintenance under an edge Δ-batch —
   * the graph toolkit's IVM face, [[Ivm.mergeAdditive]]'s sibling for a
   * view (connectivity) that is NOT an additive aggregate: given the
   * stored component view of a base graph and a batch of new edges,
   * produce the component view of base ∪ Δ WITHOUT rescanning any base
   * edge. (Edge DELETION is deliberately out of scope — decremental
   * connectivity has no contraction shortcut; the production answer is
   * periodic recompute, which [[connectedComponents]] is.)
   *
   * The algebra: connectivity quotients compose — contract every base
   * component to its representative (= its min-label, which IS a node
   * id by the [[connectedComponents]] invariant), map each Δ endpoint
   * to its representative (itself when the node is new), and union-find
   * ONLY the contracted Δ edges. A merged group's new label is the min
   * of its member representatives; since every representative is
   * already the min of its own base component and new nodes represent
   * themselves, that min is the global min node id — exactly the
   * from-scratch min-label fixpoint (the `graph_components_ivm` oracle
   * recomputes the whole graph and the hashes agree; GraphSpec pins the
   * theorem on random splits).
   *
   * Cost: |Δ| + |touched components| — one broadcast-able join of the Δ
   * endpoints against the |V|-row component view, a union-find over the
   * ≤|Δ| contracted edges (Δ edges whose endpoints already share a
   * component contract to self-loops and are dropped before the loop),
   * and one join to map touched base nodes to their new label. At
   * 100 TB the base edge set — the thing that actually grew — is never
   * read; the component view is |V|-sized and the Δ work is
   * batch-sized. Returned frame follows the [[connectedComponents]]
   * release contract (`Caches.releaseAll()` after materializing).
   *
   * `baseComponents`: (node, component) as [[connectedComponents]]
   * emits — component = min member id. `deltaEdges` may touch nodes
   * absent from the base view (they enter as their own representative).
   */
  def componentsIncremental(baseComponents: DataFrame, deltaEdges: DataFrame,
      src: String = "src", dst: String = "dst",
      loopParts: Int = 0, localPairsCap: Long = 0L): DataFrame = {
    val comp = Caches.persistTracked(
      baseComponents.select(col("node"), col("component")))
    // Δ endpoints → representatives (new nodes represent themselves)
    val repped = deltaEdges
      .join(comp.select(col("node").as(src), col("component").as("rs")),
        Seq(src), "left")
      .join(comp.select(col("node").as(dst), col("component").as("rd")),
        Seq(dst), "left")
      .select(coalesce(col("rs"), col(src)).as("ra"),
        coalesce(col("rd"), col(dst)).as("rb"))
      // an edge inside one existing component contracts to a self-loop:
      // nothing to merge, drop it before the union-find shuffle
      .filter(col("ra") =!= col("rb"))
    // localPairsCap: the contracted Δ graph is batch-bounded (≤|Δ| edges
    // after self-loop drop), the natural fit for the driver-local
    // union-find fast path (see Dedup.duplicateClusters)
    val repComp = Dedup.duplicateClusters(
      repped.select(col("ra").as("doc_a"), col("rb").as("doc_b")),
      loopParts = loopParts, localPairsCap = localPairsCap)
    // base nodes: re-label the touched components, keep the rest
    val updatedBase = comp
      .join(repComp.select(col("doc_id").as("component"),
        col("cluster")), Seq("component"), "left")
      .select(col("node"),
        coalesce(col("cluster"), col("component")).as("component"))
    // Δ-only nodes: representatives that are not base nodes (every base
    // representative IS a base node — the min-label invariant)
    val deltaOnly = repComp
      .join(comp.select(col("node")),
        repComp("doc_id") === comp("node"), "left_anti")
      .select(col("doc_id").as("node"), col("cluster").as("component"))
    updatedBase.unionAll(deltaOnly)
  }

  /**
   * MINIMUM SPANNING FOREST via synchronous Borůvka (Borůvka 1926) —
   * THE parallel/distributed MST algorithm: GHS and every
   * MST-in-MapReduce formulation reduce to its component-contraction
   * rounds, because unlike Kruskal (a global sequential edge sort) and
   * Prim (one growing frontier), every component acts INDEPENDENTLY per
   * round — exactly the shape a 1000-executor cluster wants.
   *
   * Per round, every current component simultaneously selects its
   * minimum-weight incident cross-component edge under the TOTAL order
   * (w, a, b) — the canonical pair (a, b) is unique, so no two edges
   * compare equal and the whole trajectory is a pure function of the
   * graph (the cut property holds under any consistent tie-break, so
   * the result is a true minimum spanning forest; with distinct weights
   * it is THE unique MSF). Selected edges join the forest; the
   * components they connect merge by FULL contraction (the
   * pointer-jumping union-find over the ≤C selected edges — selection
   * chains collapse in one round, not pairwise), so the component count
   * at least halves per round and `rounds` = O(log |largest component|)
   * suffices; wire the measured fixpoint + 1 idempotent margin (the
   * corenum/MIS contract — an extra round selects nothing and changes
   * nothing).
   *
   * Determinism: weights and ids are integers, the per-component argmin
   * is a partial-aggregated `min(struct(w, a, b, …))` — never a window
   * (a per-component row_number is the ORACLE's affordance) — and the
   * contraction is the min-label union-find fixpoint
   * ([[connectedComponents]]'s invariant). No doubles exist anywhere,
   * so an oracle replays every round bit-for-bit on any graph.
   *
   * Scale shape per round: two |E| equi-joins of the |V|-row label
   * frame onto the checkpointed pre-partitioned edge base (only the
   * label side re-shuffles), one partial-agg argmin keyed by component
   * (state: one struct per key), a union-find over ≤C contracted
   * selections (components-sized, shrinking geometrically), and one
   * |V| relabel join against the ≤C merge map (broadcast-able). The
   * forest accumulates ≤|V|−1 edges total. Label and selection frames
   * are lineage-capped with fresh stats every round (the corenum
   * planner-scale lesson: this loop joins its state twice per round).
   *
   * Input: canonical weighted pairs — `a` < `b`, integer weight `w`
   * (a multigraph collapses via the internal distinct; parallel edges
   * of differing weight are distinct rows and the cheapest wins the
   * argmin). Output: (round, a, b, w) — the forest edge set, each edge
   * tagged with the round that selected it (the per-round census is
   * the auditable trajectory, the kTruss idiom); an edge is selected
   * at most once, so (a, b) is unique across rounds.
   *
   * Tracked caches (base, per-round selections, merge maps) release via
   * `Caches.releaseAll()` after the caller materializes — the
   * [[connectedComponents]] contract.
   */
  def boruvkaMst(pairs: DataFrame, rounds: Int, a: String = "a",
      b: String = "b", w: String = "w", loopParts: Int = 0,
      localMergeCap: Long = 0L): DataFrame = {
    // unclaimed layout on purpose — the hits eDst rationale above
    val e = Caches.checkpointTracked(pairs
      .select(col(a).as("a"), col(b).as("b"), col(w).as("w"))
      .distinct().repartition(col("a")).sortWithinPartitions("a"))
    val lab0 = Caches.checkpointTrackedFreshStats(
      e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
        .distinct().select(col("node"), col("node").as("l")))
    val picked = Seq.newBuilder[DataFrame]
    var lab = lab0
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val ec = e
        .join(lab.select(col("node").as("a"), col("l").as("ca")), "a")
        .join(lab.select(col("node").as("b"), col("l").as("cb")), "b")
        .filter(col("ca") =!= col("cb"))
      def side(comp: Column) = ec.select(comp.as("comp"),
        struct(col("w"), col("a"), col("b"), col("ca"), col("cb")).as("cand"))
      // per-component argmin, then dedup both-sided picks on the unique
      // (a, b) key (rows are identical, so which survives is immaterial);
      // materialized fresh-stats: the frame feeds BOTH the contraction
      // and the final output union, and caps the round's lineage
      val chosen = Caches.checkpointTrackedFreshStats(
        side(col("ca")).unionAll(side(col("cb")))
          .groupBy("comp").agg(min(col("cand")).as("ce"))
          .select(col("ce.w").as("w"), col("ce.a").as("a"),
            col("ce.b").as("b"), col("ce.ca").as("ca"), col("ce.cb").as("cb"))
          .dropDuplicates("a", "b"))
      picked += chosen.select(lit(r.toLong).as("round"),
        col("a"), col("b"), col("w"))
      // EARLY EXIT on an empty selection ([[iterateUntil]]'s argument in
      // manual-loop form): no cross-component edge exists now, so none
      // can exist in any later round either (contraction only merges) —
      // the remaining wired margin rounds would each pay the two |E|
      // label joins, a union-find, and a relabel to select nothing. The
      // count reads the ALREADY-materialized selection (one leaf job
      // that also gates the local-merge cap below); the skipped rounds'
      // empty frames contribute no output rows, so the forest is
      // row-identical to the full unroll and `rounds` becomes a safety
      // CAP instead of a cost (wire it with slack).
      val nChosen = chosen.count()
      if (nChosen == 0L) done = true
      else {
        // DRIVER-LOCAL contraction under `localMergeCap` (r16 — the
        // louvainMoveWeighted localEdgeCap idiom): the merge graph has
        // ONE edge per live component, so each round's union-find input
        // is component-bounded and shrinks geometrically — yet the RDD
        // loop charges it ~5 scheduling-latency jobs per pointer-jump
        // round. Under the cap the min-label components come from the
        // plain-Scala union-find twin (bit-identical — see
        // Dedup.localMinLabelComponents; GraphSpec pins the pair);
        // round 1 of a 100 TB graph can exceed any driver heap, so the
        // count gate falls back to the distributed loop above the cap.
        val merge =
          if (localMergeCap > 0 && nChosen <= localMergeCap) {
            val spark = chosen.sparkSession
            import spark.implicits._
            spark.createDataset(Dedup.localMinLabelComponents(
                chosen.select(col("ca").cast("long"), col("cb").cast("long"))
                  .as[(Long, Long)].collect()).sortBy(_._1).toSeq)
              .toDF("doc_id", "cluster")
          } else Dedup.duplicateClusters(
            chosen.select(col("ca").as("doc_a"), col("cb").as("doc_b")),
            loopParts = loopParts)
        lab = Caches.checkpointTrackedFreshStats(
          lab.join(merge.select(col("doc_id").as("l"), col("cluster")),
              Seq("l"), "left")
            .select(col("node"), coalesce(col("cluster"), col("l")).as("l")))
      }
      r += 1
    }
    picked.result().reduce(_ unionAll _)
  }

  /**
   * PARALLEL LOUVAIN MOVE PHASE (the local-move step of Blondel et al.
   * 2008, with the DIRECTED-modularity gain of Dugué & Perez 2015 —
   * the same Q [[modularity]] scores, so the two operators compose):
   * k synchronous rounds; in each, EVERY node simultaneously
   * re-assigns itself to the candidate community maximizing the
   * isolated-join gain
   *
   *   S(v, c) = (k_v→c + k_c→v)/m
   *             − (dout_v·totin'_c + din_v·totout'_c)/m²
   *
   * over the communities of its out- and in-neighbors plus its own
   * (tot' excludes v itself when scoring its own community — the
   * remove-then-rejoin convention), ties to the SMALLEST community
   * label. A total order, so the whole k-round trajectory is a pure
   * function of the graph: classic sequential Louvain is
   * visit-order-dependent and no oracle could replay it; the
   * synchronous variant is the standard parallel-Louvain shape (the
   * documented trade: simultaneous moves can oscillate on symmetric
   * structures, so this is a FIXED-k move phase — the LPA contract —
   * not an iterate-to-convergence).
   *
   * Determinism of the score: every input is an INTEGER (edge counts
   * k_v→c/k_c→v, degrees, community degree totals), m is one exact
   * driver-collected long (the [[pageRank]] N pattern), and S is a
   * fixed-shape cast-then-multiply/divide expression — two double
   * products added in a fixed order, nothing data-order-dependent —
   * so DuckDB replays it bit-for-bit and the argmax under
   * (S desc, c asc) agrees.
   *
   * Scale shape per round: two |E| equi-joins of labels onto the
   * checkpointed pre-sorted edge base (one per direction) + partial-agg
   * counts per (node, candidate community) — candidate sets bounded by
   * degree, never materialized per node; community totals are a
   * C-row aggregate joined back on the candidate key; the argmax is a
   * partial-aggregated `max_by` under the (S, −c) struct order — never
   * a window. State is the |V|-row label frame, lineage-capped every
   * 2nd round ([[iterate]]). Output: (node, label) after `iterations`
   * rounds from the all-singletons start.
   */
  def louvainMove(edges: DataFrame, iterations: Int,
      src: String = "src", dst: String = "dst",
      symmetric: Boolean = false): DataFrame =
    louvainMoveWithBase(edges, iterations, src, dst, symmetric)._1

  /** [[louvainMove]] also returning the loop's CHECKPOINTED distinct-edge
    * base `(src, dst, w ≡ 1)`: compositions that scan the same graph again
    * after the move phase (coarsen, modularity) read the
    * already-materialized base instead of recomputing the upstream edge
    * derivation — one materialization serves the loop's k rounds AND every
    * downstream consumer (the graph_coarsen query's second lineitem
    * self-join was ~20% of its cost). The base's row multiset is exactly
    * `edges.select(src, dst).distinct()`, so substituting it downstream is
    * oracle-neutral. Released with the usual `Caches.releaseAll()`. */
  def louvainMoveWithBase(edges: DataFrame, iterations: Int,
      src: String = "src", dst: String = "dst",
      symmetric: Boolean = false): (DataFrame, DataFrame) = {
    val base = Caches.checkpointTrackedLayout(
      edges.select(col(src), col(dst)).distinct().withColumn("w", lit(1L)),
      hashCols = Seq(src), sortCols = Seq(src))
    (louvainLoop(base, iterations, src, dst, symmetric), base)
  }

  /**
   * WEIGHTED parallel Louvain move phase: [[louvainMove]] over a
   * POSITIVE-INTEGER-weighted edge list — every mass in the gain
   * (k_v→c, k_c→v, degrees, community totals, m) becomes a weight SUM
   * instead of an edge count, the formula and argmax order unchanged.
   * With w ≡ 1 the sums equal the counts, so the unweighted operator is
   * this one's special case EXACTLY (GraphSpec pins it). Self-loops are
   * legitimate input and contribute to k_v→own and both degrees — which
   * is what makes this the move phase a SECOND Louvain level runs on
   * [[coarsen]]'s output (self-loops = within-community mass).
   * Caller contract: one row per distinct (src, dst) with its weight.
   */
  def louvainMoveWeighted(edges: DataFrame, iterations: Int,
      src: String = "src", dst: String = "dst",
      weight: String = "w", symmetric: Boolean = false,
      localEdgeCap: Long = 0L): DataFrame = {
    // src/dst cast alongside w: the driver-local fast path collects with
    // getLong, which would ClassCastException on an int-typed edge frame
    // the distributed fallback happily handles — normalize both paths to
    // bigint at the door so the local≡distributed pin holds for any
    // integral input type.
    // PLAIN checkpoint when a local cap is set (r16): the local path only
    // counts and collects the frame, so the layout leaf's repartition +
    // sort + claim is pure waste there; the distributed fallback re-lays
    // the (already-materialized, ≤C²-row) leaf below — one extra tiny
    // pass only on the path that needs the layout.
    val cast = edges.select(
      col(src).cast("bigint").as(src), col(dst).cast("bigint").as(dst),
      col(weight).cast("bigint").as("w"))
    val e =
      if (symmetric && localEdgeCap > 0) Caches.checkpointTracked(cast)
      else Caches.checkpointTrackedLayout(cast,
        hashCols = Seq(src), sortCols = Seq(src))
    // DRIVER-LOCAL FAST PATH for the Louvain LEVEL-2 shape: [[coarsen]]'s
    // output is community-bounded (≤ C² edges, 2,777 at sf0.1 — and it
    // shrinks RELATIVE to |E| at scale, so the bound gets BETTER at
    // 100 TB), yet the distributed loop charges it the same ~5 shuffles
    // per round as the |E|-sized level 1, all fixed overhead. When the
    // caller opts in with `localEdgeCap > 0` and the (materialized) edge
    // frame fits, the whole move loop runs as a plain-Scala replay of
    // the symmetric loop on the collected edges — BIT-IDENTICAL, because
    // every aggregate the distributed loop computes is an integer sum
    // (order-free) and the one double score is fixed-shape scalar
    // arithmetic mirrored op-for-op, argmax under the same (s desc,
    // c asc) total order (GraphSpec pins local ≡ distributed on random
    // symmetric/self-looped graphs). Above the cap — a coarse graph of a
    // 100 TB corpus can exceed any driver heap — it falls back to the
    // distributed loop; the count deciding it is one bounded job on the
    // checkpointed frame. Symmetric-only: the level-2 contract
    // guarantees symmetry, and mirroring one loop keeps the twin small.
    if (symmetric && localEdgeCap > 0 && e.count() <= localEdgeCap) {
      val spark = e.sparkSession
      val collected = e.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
      import spark.implicits._
      spark.createDataset(
        louvainLocalReplay(collected, iterations).sortBy(_._1).toSeq)
        .toDF("node", "label")
    } else if (symmetric && localEdgeCap > 0) {
      // over-cap fallback: lay out the plain leaf for the distributed loop
      louvainLoop(Caches.checkpointTrackedLayout(e,
        hashCols = Seq(src), sortCols = Seq(src)), iterations, src, dst,
        symmetric)
    } else louvainLoop(e, iterations, src, dst, symmetric)
  }

  /** The plain-Scala twin of [[louvainLoop]]'s symmetric branch — same
    * integer sums, same fixed-shape double score evaluated in the same
    * operator order, same (s desc, c asc) argmax; labels update
    * SYNCHRONOUSLY (all scores read the previous round's labels). Kept
    * in op-for-op sync with the distributed loop — GraphSpec pins the
    * pair (the ShingleHashes twin convention). */
  private[graft] def louvainLocalReplay(edges: Array[(Long, Long, Long)],
      iterations: Int): Array[(Long, Long)] = {
    val m = edges.iterator.map(_._3).sum.toDouble
    val d = scala.collection.mutable.HashMap.empty[Long, Long]
    edges.foreach { case (s, _, w) =>
      d(s) = d.getOrElse(s, 0L) + w
    }
    val label = scala.collection.mutable.HashMap.empty[Long, Long]
    d.keysIterator.foreach(n => label(n) = n)
    for (_ <- 1 to iterations) {
      val t = scala.collection.mutable.HashMap.empty[Long, Long]
      d.foreach { case (n, dn) =>
        val c = label(n); t(c) = t.getOrElse(c, 0L) + dn
      }
      val kvc = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      edges.foreach { case (s, dst, w) =>
        val key = (s, label(dst)); kvc(key) = kvc.getOrElse(key, 0L) + w
      }
      // the always-present own-community candidate (the distributed
      // loop's zero-kvc union row)
      d.keysIterator.foreach { n =>
        val own = (n, label(n))
        if (!kvc.contains(own)) kvc(own) = 0L
      }
      val best = scala.collection.mutable.HashMap.empty[Long, (Double, Long)]
      kvc.foreach { case ((n, c), k) =>
        val dn = d(n)
        val adj = if (label(n) == c) dn else 0L
        val s = (k * 2L).toDouble / m -
          dn.toDouble * (t(c) - adj).toDouble * 2.0 / m / m
        best.get(n) match {
          case Some((bs, bc)) if s > bs || (s == bs && c < bc) =>
            best(n) = (s, c)
          case None => best(n) = (s, c)
          case _ => ()
        }
      }
      best.foreach { case (n, (_, c)) => label(n) = c }
    }
    label.iterator.map { case (n, c) => (n, c) }.toArray
  }

  /** The shared move loop: `e` is the checkpointed (src, dst, w) base —
    * w ≡ 1 for the unweighted face (sums of ones ARE the counts, so the
    * two faces share one plan shape and one oracle technique).
    *
    * `symmetric = true` is the caller's ASSERTION that `e` is a
    * symmetric edge list — for every (u, v, w) the reverse (v, u, w) is
    * present (self-loops are their own reverse) — which is exactly what
    * a symmetrized co-purchase / co-occurrence graph and [[coarsen]]'s
    * output on one are. Under that assertion k_v→c = k_c→v, dout = din
    * and tout = tin, so the loop computes ONE |E| label join and ONE
    * degree/total aggregate per round instead of two and doubles the
    * masses in the gain — BIT-FOR-BIT the general score, because the
    * halves it folds are exactly equal: kvc + kcv = kvc·2 on longs, and
    * the two double products X + X = X·2.0 in IEEE for every finite X
    * (GraphSpec pins fast ≡ general on random symmetrized and
    * self-looped graphs). An asymmetric edge list under `symmetric =
    * true` is a CONTRACT VIOLATION and silently scores the wrong gain —
    * the flag is never inferred (an |E| self-anti-join per call would
    * cost what the fast path saves). */
  private def louvainLoop(e: DataFrame, iterations: Int,
      src: String, dst: String, symmetric: Boolean): DataFrame = {
    // bounded eager job: ONE driver-side long (total edge weight)
    val m = e.agg(sum(col("w"))).collect()(0).getLong(0).toDouble
    if (symmetric) {
      // one aggregate: d = dout = din (every node appears as a src by
      // symmetry, so no full-outer node-universe merge is needed).
      // The loop STATE CARRIES d (node, label, d): degrees are constant
      // across rounds, so folding them into the iterated frame turns
      // `tot` from a join+aggregate into one aggregate and drops the
      // degs leg of the scoring join — two fewer shuffles per round on
      // a 5-shuffle round, values bit-identical (the same long sums and
      // the same fixed-shape double expression, just routed through the
      // state instead of a re-join; max(d) per node group IS d).
      val degs = Caches.checkpointTracked(
        e.groupBy(col(src).as("node")).agg(sum(col("w")).as("d")))
      val lab0 = degs.select(col("node"), col("node").as("label"), col("d"))
      // capEvery = 1 (was 2): each round references lab FOUR times (two
      // join legs, own-community rows, community totals), and with the
      // measured-stats leaves those references plan as broadcast builds —
      // each of which re-derives an UNmaterialized previous round from
      // scratch. A per-round |V| checkpoint makes every reference a leaf
      // read (measured at sf0.1: the 3-round loop 9.4 → 5.3 s; the old
      // every-2nd cap was tuned for the pre-layout SMJ shape)
      iterate(lab0, iterations, capEvery = 1) { (lab, _, cap) =>
        val tot = lab.groupBy("label")
          .agg(sum(col("d")).as("t"))
          .withColumnRenamed("label", "c")
        // v's OWN (label, d) ride through the contribution join on the
        // src key — e is pre-partitioned by src, so this join adds no
        // edge-side exchange (lab broadcasts at |V| scale, or exchanges
        // |V| rows) — and the round loses the post-aggregation
        // cand-⋈-lab scoring join (two |candidate|/|V|-row exchanges on
        // node) it existed to feed. Values bit-identical: label and d
        // are constant within a (node, c) group, so max() IS the value.
        val contrib = e
          .join(lab.select(col("node").as(src), col("label"), col("d")), src)
          .join(lab.select(col("node").as(dst), col("label").as("c")), dst)
          .select(col(src).as("node"), col("c"), col("w").as("kvc"),
            col("label"), col("d"))
        // out-mass plus the always-present own-community row (the in
        // leg of the general loop is this one's mirror image — folded
        // into the ·2 below, not recomputed)
        // ONE exchange for BOTH aggregation levels (r15, the
        // foldedContribSum trick): HashPartitioning(node) satisfies
        // ClusteredDistribution(node, c) AND survives the broadcast tot
        // join, so the candidate aggregate and the final argmax both run
        // exchange-free on it — the unhinted shape paid two exchanges per
        // round (hash(node, c) after the union, hash(node) before the
        // argmax). Values identical: integer sums are order-free and the
        // argmax order is strict.
        val cand = contrib
          .unionAll(lab.select(col("node"), col("label").as("c"),
            lit(0L).as("kvc"), col("label"), col("d")))
          .repartition(col("node"))
          .groupBy("node", "c")
          .agg(sum(col("kvc")).as("kvc"), max(col("label")).as("label"),
            max(col("d")).as("d"))
        val scored = cand
          .join(tot, "c")
          .select(col("node"), col("c"), col("d"),
            // (kvc·2).cast = (kvc + kcv).cast on equal longs;
            // X·2.0 = X + X bitwise for the equal double products —
            // the general gain, computed once and doubled
            ((col("kvc") * lit(2L)).cast("double") / lit(m)
              - col("d").cast("double")
                * (col("t") - when(col("label") === col("c"), col("d"))
                    .otherwise(lit(0L))).cast("double")
                * lit(2.0)
                / lit(m) / lit(m)).as("s"))
        cap(scored.groupBy("node")
          .agg(max_by(col("c"), struct(col("s"), (-col("c")).as("nc")))
            .as("label"),
            max(col("d")).as("d")))
      }.select("node", "label")
    } else {
      // the symmetric branch's state-carried-degree shape, with both
      // directed degrees riding in the state
      val degs = Caches.checkpointTracked(
        e.groupBy(col(src).as("node")).agg(sum(col("w")).as("dout"))
          .join(e.groupBy(col(dst).as("node")).agg(sum(col("w")).as("din")),
            Seq("node"), "full")
          .select(col("node"), coalesce(col("dout"), lit(0L)).as("dout"),
            coalesce(col("din"), lit(0L)).as("din")))
      val lab0 = degs.select(col("node"), col("node").as("label"),
        col("dout"), col("din"))
      iterate(lab0, iterations, capEvery = 1) { (lab, _, cap) =>
        val tot = lab.groupBy("label")
          .agg(sum(col("dout")).as("tout"), sum(col("din")).as("tin"))
          .withColumnRenamed("label", "c")
        // the symmetric branch's ride-through shape on both legs: each
        // |E| join picks up the scored node's own (label, dout, din) on
        // its grouping key, so no post-aggregation scoring join remains
        val kout = e
          .join(lab.select(col("node").as(src), col("label"),
            col("dout"), col("din")), src)
          .join(lab.select(col("node").as(dst), col("label").as("c")), dst)
          .select(col(src).as("node"), col("c"), col("w").as("kvc"),
            col("label"), col("dout"), col("din"))
        val kin = e
          .join(lab.select(col("node").as(dst), col("label"),
            col("dout"), col("din")), dst)
          .join(lab.select(col("node").as(src), col("label").as("c")), src)
          .select(col(dst).as("node"), col("c"), col("w").as("kcv"),
            col("label"), col("dout"), col("din"))
        // out-mass, in-mass, and the always-present own-community row
        // merge in one partial-agg pass; tot' subtracts v's own degrees
        // when it scores the community it is already in.
        // NO repartition(node) one-exchange hint here (unlike the
        // symmetric branch): no wired query runs this branch — every
        // co-purchase/coarse graph is symmetric — so the hint was never
        // measured on it; left unhinted rather than blind-copied (r15
        // ADVICE item, recorded not attempted).
        val cand = kout
          .select(col("node"), col("c"), col("kvc"), lit(0L).as("kcv"),
            col("label"), col("dout"), col("din"))
          .unionAll(kin.select(col("node"), col("c"),
            lit(0L).as("kvc"), col("kcv"),
            col("label"), col("dout"), col("din")))
          .unionAll(lab.select(col("node"), col("label").as("c"),
            lit(0L).as("kvc"), lit(0L).as("kcv"),
            col("label"), col("dout"), col("din")))
          .groupBy("node", "c")
          .agg(sum(col("kvc")).as("kvc"), sum(col("kcv")).as("kcv"),
            max(col("label")).as("label"),
            max(col("dout")).as("dout"), max(col("din")).as("din"))
        val scored = cand
          .join(tot, "c")
          .select(col("node"), col("c"), col("dout"), col("din"),
            ((col("kvc") + col("kcv")).cast("double") / lit(m)
              - (col("dout").cast("double")
                  * (col("tin") - when(col("label") === col("c"), col("din"))
                      .otherwise(lit(0L))).cast("double")
                 + col("din").cast("double")
                  * (col("tout") - when(col("label") === col("c"), col("dout"))
                      .otherwise(lit(0L))).cast("double"))
                / lit(m) / lit(m)).as("s"))
        cap(scored.groupBy("node")
          .agg(max_by(col("c"), struct(col("s"), (-col("c")).as("nc")))
            .as("label"),
            max(col("dout")).as("dout"), max(col("din")).as("din")))
      }.select("node", "label")
    }
  }

  /**
   * DIRECTED MODULARITY of a node partition (Leicht & Newman 2008,
   * "Community structure in directed networks" — reduces to Newman's
   * undirected Q on a symmetrized edge list, which is exactly what the
   * co-purchase graph is): per-community
   *
   *   q_c = e_c/m − (out_c · in_c)/m²
   *
   * where m = |E| (directed edges), e_c = edges with BOTH endpoints in c,
   * out_c/in_c = total out-/in-degree of c's nodes. Σ_c q_c is the usual
   * global Q ∈ [−1/2, 1); the per-community rows are the useful
   * diagnostic (which communities are denser than chance).
   *
   * Determinism: every input to q_c is an INTEGER COUNT, and the one
   * double expression is fixed-shape (`within/m − out·in/m/m`, casts
   * applied before the divides) — an oracle mirrors it op-for-op with no
   * summation-order ambiguity because nothing sums doubles. The global Q
   * is intentionally NOT a column here: summing C per-community doubles
   * is order-dependent; [[modularityTotal]] computes it from exact
   * integer sums instead.
   *
   * Scale shape: ONE |E|-sized shuffle — edges join the broadcast-able
   * label map on each endpoint (two equi-joins on node), then a single
   * `groupBy(sl, dl)` partial-aggregated count produces the community
   * MIXING MATRIX (≤ C² entries, sparse in practice); within/out/in all
   * derive from that compact frame with tiny aggregations. m rides in as
   * a one-row broadcast (`crossJoin(broadcast(...))` — a
   * BroadcastNestedLoopJoin over one row, never a CartesianProduct). No
   * window, nothing data-sized on the driver. At 100 TB the label map is
   * |V|-sized — when it outgrows broadcast, the two joins shuffle on
   * node, which AQE handles; the mixing matrix stays ≤ C².
   *
   * Output: (label, nodes, within_edges, out_degree, in_degree, q), one
   * row per community in the `labels` frame (communities whose nodes
   * have no edges still appear, zero-filled).
   *
   * Caller contract: edges are used AS GIVEN — a multigraph is a
   * legitimate input (every duplicate edge counts in m and the
   * marginals). Unlike [[pageRank]]/[[labelPropagation]] there is no
   * internal `distinct()`; dedupe upstream for a simple graph. `labels`
   * must cover every edge endpoint (m is derived from the labeled
   * mixing matrix — an unlabeled endpoint would silently drop its
   * edges; a partition that misses nodes is ill-posed for Q anyway).
   * Both persisted intermediates release via `Caches.releaseAll()`.
   */
  def modularity(edges: DataFrame, labels: DataFrame,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val (lab, mixing) = labeledMixing(edges, labels, src, dst)
    val mDf = mixing.agg(sum(col("cnt")).cast("double").as("m"))
    communityMarginals(lab, mixing)
      .crossJoin(broadcast(mDf))
      .select(col("label"), col("nodes"), col("within_edges"),
        col("out_degree"), col("in_degree"),
        (col("within_edges").cast("double") / col("m")
          - col("out_degree").cast("double")
            * col("in_degree").cast("double")
            / col("m") / col("m")).as("q"))
  }

  /** The one |E|-shuffle behind [[modularity]]/[[modularityTotal]]: label
    * both endpoints, collapse to the ≤C² community mixing matrix. BOTH
    * frames persist through [[Caches]] — the label frame is |V|-bounded
    * and typically the output of an ITERATIVE operator (LPA), whose whole
    * loop would otherwise replay once per downstream consumer (three
    * joins read it here — measured 3× the LPA cost before persisting);
    * the mixing matrix feeds m plus three marginal aggregations. m is
    * derived FROM the matrix (Σcnt — one tiny agg on C² rows) instead of
    * a second |E| scan; by the label-coverage contract this equals |E|. */
  private def labeledMixing(edges: DataFrame, labels: DataFrame,
      src: String, dst: String): (DataFrame, DataFrame) = {
    val e = edges.select(col(src).as("s"), col(dst).as("d"))
    val lab = Caches.persistTracked(labels.select(col("node"), col("label")))
    // checkpointTracked, NOT persistTracked (r15): the mixing matrix is
    // read by FOUR subtrees (within/out/in marginals + m), and a cache
    // entry is only reused where the CacheManager's plan match fires —
    // measured with a checkpoint-leaf edge input, three of the four
    // references missed the cache and re-ran the two label joins + the
    // |E| aggregation each (graph_modularity 9.0 → 15.8 s). A checkpoint
    // is a LEAF — every reference reads the ≤C²-row materialization by
    // construction, no matcher in the loop.
    val mixing = Caches.checkpointTracked(e
      .join(lab.select(col("node").as("s"), col("label").as("sl")), "s")
      .join(lab.select(col("node").as("d"), col("label").as("dl")), "d")
      .groupBy("sl", "dl").agg(count(lit(1)).as("cnt")))
    (lab, mixing)
  }

  /** (label, nodes, within_edges, out_degree, in_degree) per community —
    * the integer inputs both modularity faces share. All-tiny aggs and
    * joins over the C²-bounded mixing matrix and the |V| label frame. */
  private def communityMarginals(lab: DataFrame,
      mixing: DataFrame): DataFrame = {
    val within = mixing.filter(col("sl") === col("dl"))
      .select(col("sl").as("label"), col("cnt").as("within_edges"))
    val outDeg = mixing.groupBy(col("sl").as("label"))
      .agg(sum(col("cnt")).as("out_degree"))
    val inDeg = mixing.groupBy(col("dl").as("label"))
      .agg(sum(col("cnt")).as("in_degree"))
    lab.groupBy("label").agg(count(lit(1)).as("nodes"))
      .join(within, Seq("label"), "left")
      .join(outDeg, Seq("label"), "left")
      .join(inDeg, Seq("label"), "left")
      .select(col("label"), col("nodes"),
        coalesce(col("within_edges"), lit(0L)).as("within_edges"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  /**
   * LOUVAIN AGGREGATION PHASE (the coarsening half of Blondel et al.
   * 2008, next to [[louvainMove]]'s local-move half): collapse a node
   * partition into its WEIGHTED COMMUNITY GRAPH — one node per
   * community, edge weight = number of original edges between the two
   * communities, SELF-LOOPS carrying the within-community mass (the
   * standard aggregation convention: a second-level pass needs that
   * mass to score further merges). This is exactly the community
   * mixing matrix [[modularity]] aggregates — ONE |E|-shuffle, output
   * ≤C² rows — exposed as a graph so community-level structure can be
   * fed back through the toolkit (triangles/components/pagerank of the
   * community graph, or plain inspection: "which communities talk").
   *
   * Caller contract matches [[modularity]]: edges as given (multigraph
   * weights accumulate), labels must cover every edge endpoint,
   * intermediates release via `Caches.releaseAll()`.
   *
   * Output: (src, dst, weight) — community ids from `labels`, ordered
   * by nothing (callers sort).
   */
  def coarsen(edges: DataFrame, labels: DataFrame,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val (_, mixing) = labeledMixing(edges, labels, src, dst)
    mixing.select(col("sl").as("src"), col("dl").as("dst"),
      col("cnt").as("weight"))
  }

  /**
   * GLOBAL modularity Q = Σ_c q_c, computed WITHOUT summing doubles:
   * Q = W/m − P/m² where W = Σ_c e_c and P = Σ_c out_c·in_c are exact
   * integer sums (order-independent), divided once at the end with the
   * same cast-then-divide shape as [[modularity]]. Long arithmetic holds
   * to m < ~3·10⁹ per community-degree product; beyond that (the 100 TB
   * regime) switch the two sums to DECIMAL(38,0) — Spark's decimal sum
   * is exact and deterministic too.
   *
   * Output: one row (m, within_total, degree_product_sum, q).
   */
  def modularityTotal(edges: DataFrame, labels: DataFrame,
      src: String = "src", dst: String = "dst"): DataFrame = {
    val (lab, mixing) = labeledMixing(edges, labels, src, dst)
    val mDf = mixing.agg(sum(col("cnt")).cast("double").as("m"))
    communityMarginals(lab, mixing).agg(
        sum(col("within_edges")).as("within_total"),
        sum(col("out_degree") * col("in_degree")).as("degree_product_sum"))
      .crossJoin(broadcast(mDf))
      .select(col("m"), col("within_total"), col("degree_product_sum"),
        (col("within_total").cast("double") / col("m")
          - col("degree_product_sum").cast("double") / col("m") / col("m"))
          .as("q"))
  }

  /**
   * [[modularityTotal]] of a COMPOSED two-level partition, computed from
   * the LEVEL-1 COMMUNITY GRAPH instead of rescanning the node graph
   * (r16): given `coarse` = [[coarsen]](edges, l1) and the level-2 label
   * map `l2` over its nodes, the output row is BIT-IDENTICAL to
   * `modularityTotal(edges, l1 ⋈ l2)` — but the two label joins and the
   * mixing aggregation run over the ≤C²-row community graph (2,777 rows
   * at sf0.1) instead of the |E| edge list.
   *
   * WHY it is exact: the node-graph mixing matrix of the composed labels
   * is an aggregation of the level-1 mixing matrix —
   * mixing₂(c₁, c₂) = Σ { mixing₁(s, d) : l2(s) = c₁, l2(d) = c₂ } —
   * and `coarse` IS mixing₁ by [[coarsen]]'s definition (weight = edge
   * count between level-1 communities, self-loops = within mass). Every
   * quantity [[modularityTotal]] derives (m, within_total, the out/in
   * marginals feeding degree_product_sum) is an exact LONG sum over the
   * mixing matrix — order-free, so regrouping through mixing₁ yields the
   * same integers — and the final q expression is the same fixed-shape
   * cast-then-divide over them, hence the same double bits. Coverage
   * matches too: every level-1 label with an edge appears in `coarse`
   * and must appear in `l2` (the [[modularity]] label-coverage
   * contract), and edge-less communities contribute zero to every sum
   * on both routes. GraphSpec pins the law on random graphs and random
   * two-level partitions; the wired `graph_louvain2_q` oracle (which
   * replays Q from scratch on the node graph) is the driver-side pin.
   *
   * Output: (m, within_total, degree_product_sum, q) — the
   * [[modularityTotal]] row. Intermediates release via
   * `Caches.releaseAll()`.
   */
  def modularityTotalFromCoarse(coarse: DataFrame, l2: DataFrame,
      src: String = "src", dst: String = "dst",
      weight: String = "weight"): DataFrame = {
    val lab = Caches.persistTracked(l2.select(col("node"), col("label")))
    // the composed-partition mixing matrix by regrouping the level-1 one:
    // sum(weight) where labeledMixing counts rows — same ≤C²-row
    // checkpoint-leaf shape, read by the same four subtrees
    val mixing = Caches.checkpointTracked(coarse
      .select(col(src).as("s"), col(dst).as("d"), col(weight).as("cw"))
      .join(lab.select(col("node").as("s"), col("label").as("sl")), "s")
      .join(lab.select(col("node").as("d"), col("label").as("dl")), "d")
      .groupBy("sl", "dl").agg(sum(col("cw")).as("cnt")))
    val mDf = mixing.agg(sum(col("cnt")).cast("double").as("m"))
    communityMarginals(lab, mixing).agg(
        sum(col("within_edges")).as("within_total"),
        sum(col("out_degree") * col("in_degree")).as("degree_product_sum"))
      .crossJoin(broadcast(mDf))
      .select(col("m"), col("within_total"), col("degree_product_sum"),
        (col("within_total").cast("double") / col("m")
          - col("degree_product_sum").cast("double") / col("m") / col("m"))
          .as("q"))
  }
}
