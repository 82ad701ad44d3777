package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/**
 * Extension tier A — star-schema analytics the reference lacks entirely
 * (SURVEY.md §2.7/§2.8/§2.14: no joins, no windows, no distinct, no top-k,
 * no rollup). All plans are declarative DataFrame chains so Catalyst picks
 * broadcast vs shuffle joins, pushes filters into scans, and AQE handles
 * skew at scale.
 *
 * Floating-point policy: every double aggregate is rounded (2dp) in BOTH the
 * Spark plan and the oracle SQL — double sums at different partition orders
 * agree far below 0.005, so rounding makes the hash comparison stable.
 */
object StarQueries {

  /** Oracle for `graph_pagerank`: k power-iteration steps unrolled as a
    * CTE chain (the bpe_merges technique). Each level replays the
    * engine's update exactly: per-node incoming mass as the engine's
    * TWO-LEVEL deterministic fold — contributions salted into `b`
    * buckets by src % b (default b = 16, the ONE shared constant with
    * the engine's `foldBuckets = 16` default; change BOTH or the
    * bit-equality contract breaks), sorted-folded within each
    * (dst, bucket) by contributor id, then the per-bucket partial sums
    * sorted-folded by bucket id (two nested list_sort + list_reduce
    * levels — the hub-safe association order the engine uses so no
    * aggregation key ever owns more than in-degree/b
    * contributions) — then
    * (1.0 − 0.85)/N + 0.85·Σ — the jump term spelled as the SAME
    * subtraction the driver computes, with BOTH literals cast to DOUBLE:
    * DuckDB parses bare 1.0/0.85 as DECIMAL and folds the subtraction
    * EXACTLY to 0.15, which is NOT the binary (1.0 − 0.85) =
    * 0.15000000000000002 the JVM computes — a one-ulp mismatch that
    * compounds through the iterations (measured: last-digit drift at
    * sf0.01 before the casts). */
  private def pageRankOracle(k: Int, b: Int = 16): String = {
    def level(i: Int): String =
      s"""r$i AS (
         |  SELECT nd.node,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(n AS DOUBLE)
         |      + CAST(0.85 AS DOUBLE) * COALESCE(s.s, CAST(0.0 AS DOUBLE)) AS pr
         |  FROM nodes nd CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT b.dst, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(bkt := b.bkt,
         |        bs := b.bs))), x -> x.bs)), (a, x) -> a + x) AS s
         |    FROM (
         |      SELECT e.dst, e.src % $b AS bkt,
         |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(list_sort(list(struct_pack(src := e.src,
         |            c := r.pr / CAST(d.deg AS DOUBLE)))), x -> x.c)),
         |          (a, x) -> a + x) AS bs
         |      FROM e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.node
         |      GROUP BY e.dst, e.src % $b
         |    ) b GROUP BY b.dst
         |  ) s ON nd.node = s.dst
         |)""".stripMargin
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |), deg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
       |), nodes AS (SELECT src AS node FROM deg),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (
       |  SELECT node, 1.0 / CAST(n AS DOUBLE) AS pr FROM nodes CROSS JOIN nn
       |),
       |${(1 to k).map(level).mkString(",\n")}
       |SELECT node, pr FROM r$k ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_hits`: k levels, each two half-steps — the
    * authority fold (hub mass over in-edges, keyed by dst, bucketed by
    * src % b) and the hub fold (authority mass over out-edges, keyed by
    * src, bucketed by dst % b) — each COALESCE'd over the node universe,
    * max-rescaled via a scalar CTE, divided in the engine's op order.
    * The nested list_sort + list_reduce fold levels are
    * [[pageRankOracle]]'s verbatim; max over doubles is
    * order-independent, which is the whole reason [[Graph.hits]]
    * normalizes by max instead of an (un-replayable) L2 sum. */
  private def hitsOracle(k: Int, b: Int = 16): String = {
    def fold(keyOut: String, key: String, by: String, elem: String,
        from: String): String =
      s"""SELECT t.$key AS $keyOut, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform(list_sort(list(struct_pack(bkt := t.bkt,
         |    bs := t.bs))), x -> x.bs)), (a, x) -> a + x) AS s
         |FROM (
         |  SELECT e.$key, e.$by % $b AS bkt,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(by := e.$by,
         |        c := $elem))), x -> x.c)), (a, x) -> a + x) AS bs
         |  FROM e JOIN $from v ON e.$by = v.node
         |  GROUP BY e.$key, e.$by % $b
         |) t GROUP BY t.$key""".stripMargin
    def level(i: Int): String =
      s"""ar$i AS MATERIALIZED (
         |  SELECT nd.node, COALESCE(s.s, CAST(0.0 AS DOUBLE)) AS raw
         |  FROM nodes nd LEFT JOIN (
         |${fold("dst", "dst", "src", "v.hub", s"h${i - 1}")}
         |  ) s ON nd.node = s.dst
         |), am$i AS (SELECT max(raw) AS mx FROM ar$i),
         |a$i AS MATERIALIZED (
         |  SELECT node, raw / mx AS auth FROM ar$i CROSS JOIN am$i
         |), hr$i AS MATERIALIZED (
         |  SELECT nd.node, COALESCE(s.s, CAST(0.0 AS DOUBLE)) AS raw
         |  FROM nodes nd LEFT JOIN (
         |${fold("src", "src", "dst", "v.auth", s"a$i")}
         |  ) s ON nd.node = s.src
         |), hm$i AS (SELECT max(raw) AS mx FROM hr$i),
         |h$i AS MATERIALIZED (
         |  SELECT node, raw / mx AS hub FROM hr$i CROSS JOIN hm$i
         |)""".stripMargin
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS src,
       |    l.l_partkey + 1000000000 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |), nodes AS MATERIALIZED (
       |  SELECT src AS node FROM e UNION SELECT dst FROM e
       |),
       |h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes),
       |${(1 to k).map(level).mkString(",\n")}
       |SELECT h.node AS node, h.hub AS hub, a.auth AS auth
       |FROM h$k h JOIN a$k a ON h.node = a.node
       |ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_pagerank_weighted`: [[pageRankOracle]]'s
    * two-level-fold CTE chain with WEIGHTED contributions — the edge CTE
    * carries w = shared-order count, sw = Σ out-weights replaces deg,
    * and the fold's element is r.pr · CAST(w AS DOUBLE) / CAST(sw AS
    * DOUBLE), the same (pr·w)/sw op order the engine fixes. Every other
    * double rule (cast-before-divide, the never-pre-folded 0.15, nested
    * list_sort + list_reduce levels) is pageRankOracle's verbatim. */
  private def pageRankWeightedOracle(k: Int, b: Int = 16): String = {
    def level(i: Int): String =
      s"""r$i AS (
         |  SELECT nd.node,
         |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(n AS DOUBLE)
         |      + CAST(0.85 AS DOUBLE) * COALESCE(s.s, CAST(0.0 AS DOUBLE)) AS pr
         |  FROM nodes nd CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT b.dst, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(bkt := b.bkt,
         |        bs := b.bs))), x -> x.bs)), (a, x) -> a + x) AS s
         |    FROM (
         |      SELECT e.dst, e.src % $b AS bkt,
         |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(list_sort(list(struct_pack(src := e.src,
         |            c := r.pr * CAST(e.w AS DOUBLE) / CAST(d.sw AS DOUBLE)))),
         |            x -> x.c)),
         |          (a, x) -> a + x) AS bs
         |      FROM e JOIN swd d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.node
         |      GROUP BY e.dst, e.src % $b
         |    ) b GROUP BY b.dst
         |  ) s ON nd.node = s.dst
         |)""".stripMargin
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS (
       |  SELECT a.pk AS src, b.pk AS dst, count(*) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |  GROUP BY a.pk, b.pk
       |), swd AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM e GROUP BY src
       |), nodes AS (SELECT src AS node FROM swd),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (
       |  SELECT node, 1.0 / CAST(n AS DOUBLE) AS pr FROM nodes CROSS JOIN nn
       |),
       |${(1 to k).map(level).mkString(",\n")}
       |SELECT node, pr FROM r$k ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_ppr`: [[pageRankOracle]]'s two-level-fold CTE
    * chain with the PERSONALIZED teleport — the jump term is a CASE over
    * seed membership ((1−d)/|S| on the `nSeeds` smallest nodes, else an
    * exact 0.0), r0 is 1/|S| on seeds. |S| is spelled as the literal
    * `$nSeeds` because the engine side computes (1.0−0.85)/seeds.size
    * driver-side with the same op order; every other double rule
    * (cast-before-divide, the never-pre-folded 0.15) is pageRankOracle's
    * verbatim. */
  private def pprOracle(k: Int, nSeeds: Int, b: Int = 16): String = {
    val jump =
      s"""CASE WHEN nd.node IN (SELECT node FROM seeds)
         |      THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |           / CAST($nSeeds AS DOUBLE)
         |      ELSE CAST(0.0 AS DOUBLE) END""".stripMargin
    def level(i: Int): String =
      s"""r$i AS (
         |  SELECT nd.node,
         |    $jump
         |      + CAST(0.85 AS DOUBLE) * COALESCE(s.s, CAST(0.0 AS DOUBLE)) AS pr
         |  FROM nodes nd
         |  LEFT JOIN (
         |    SELECT b.dst, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(bkt := b.bkt,
         |        bs := b.bs))), x -> x.bs)), (a, x) -> a + x) AS s
         |    FROM (
         |      SELECT e.dst, e.src % $b AS bkt,
         |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(list_sort(list(struct_pack(src := e.src,
         |            c := r.pr / CAST(d.deg AS DOUBLE)))), x -> x.c)),
         |          (a, x) -> a + x) AS bs
         |      FROM e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.node
         |      GROUP BY e.dst, e.src % $b
         |    ) b GROUP BY b.dst
         |  ) s ON nd.node = s.dst
         |)""".stripMargin
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |), deg AS (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
       |), nodes AS (SELECT src AS node FROM deg),
       |seeds AS (SELECT node FROM nodes ORDER BY node LIMIT $nSeeds),
       |r0 AS (
       |  SELECT node,
       |    CASE WHEN node IN (SELECT node FROM seeds)
       |         THEN CAST(1.0 AS DOUBLE) / CAST($nSeeds AS DOUBLE)
       |         ELSE CAST(0.0 AS DOUBLE) END AS pr
       |  FROM nodes
       |),
       |${(1 to k).map(level).mkString(",\n")}
       |SELECT node, pr FROM r$k ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_louvain`: k synchronous parallel-Louvain move
    * rounds unrolled as a CTE chain. Each level replays the engine's
    * round exactly: community degree totals (all BIGINT), the per-(node,
    * candidate) edge masses as a 3-way UNION ALL (out-mass, in-mass, the
    * always-present own-community row) summed in one GROUP BY, then the
    * directed-gain argmax under (S DESC, c ASC) — S mirrored
    * op-for-op (CAST-then-multiply/divide, the two products added in a
    * fixed order, tot' subtracting v's own degrees via the same CASE).
    * Every lab/tot/cand level is AS MATERIALIZED — levels are referenced
    * several times each and default inlining would compound
    * exponentially across rounds (the graph_corenum lesson). */
  private def louvainCtes(k: Int): String = {
    def level(i: Int): String =
      s"""t$i AS MATERIALIZED (
         |  SELECT l.label AS c, CAST(sum(d.dout) AS BIGINT) AS tout,
         |    CAST(sum(d.din) AS BIGINT) AS tin
         |  FROM l${i - 1} l JOIN degs d ON l.node = d.node GROUP BY l.label
         |), cand$i AS MATERIALIZED (
         |  SELECT node, c, CAST(sum(kvc) AS BIGINT) AS kvc,
         |    CAST(sum(kcv) AS BIGINT) AS kcv FROM (
         |    SELECT e.src AS node, l.label AS c, 1 AS kvc, 0 AS kcv
         |    FROM e JOIN l${i - 1} l ON e.dst = l.node
         |    UNION ALL
         |    SELECT e.dst, l.label, 0, 1 FROM e JOIN l${i - 1} l ON e.src = l.node
         |    UNION ALL
         |    SELECT node, label, 0, 0 FROM l${i - 1})
         |  GROUP BY node, c
         |), l$i AS MATERIALIZED (
         |  SELECT node, c AS label FROM (
         |    SELECT cand.node, cand.c,
         |      row_number() OVER (PARTITION BY cand.node ORDER BY
         |        CAST(cand.kvc + cand.kcv AS DOUBLE) / mm.m
         |        - (CAST(d.dout AS DOUBLE)
         |             * CAST(t.tin - CASE WHEN l.label = cand.c
         |                 THEN d.din ELSE 0 END AS DOUBLE)
         |           + CAST(d.din AS DOUBLE)
         |             * CAST(t.tout - CASE WHEN l.label = cand.c
         |                 THEN d.dout ELSE 0 END AS DOUBLE))
         |          / mm.m / mm.m DESC, cand.c ASC) AS rn
         |    FROM cand$i cand
         |    JOIN degs d ON cand.node = d.node
         |    JOIN l${i - 1} l ON cand.node = l.node
         |    JOIN t$i t ON cand.c = t.c
         |    CROSS JOIN mm)
         |  WHERE rn = 1
         |)""".stripMargin
    s"""li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |), douts AS (SELECT src AS node, count(*) AS dout FROM e GROUP BY src),
       |dins AS (SELECT dst AS node, count(*) AS din FROM e GROUP BY dst),
       |degs AS MATERIALIZED (
       |  SELECT COALESCE(o.node, i.node) AS node,
       |    COALESCE(o.dout, 0) AS dout, COALESCE(i.din, 0) AS din
       |  FROM douts o FULL JOIN dins i ON o.node = i.node
       |), mm AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS m FROM e),
       |l0 AS (SELECT node, node AS label FROM degs),
       |${(1 to k).map(level).mkString(",\n")}""".stripMargin
  }

  private def louvainOracle(k: Int): String =
    s"""WITH ${louvainCtes(k)}
       |SELECT node, label FROM l$k ORDER BY node""".stripMargin

  /** The WEIGHTED Louvain CTE machinery, name-prefixed so two chains
    * can coexist in one statement (the two-level `graph_louvain2`
    * oracle): given an edge CTE `$e` with (src, dst, w), emits
    * `${p}degs`/`${p}mm`/`${p}l0..k` etc. — every mass a weight sum,
    * the gain expression and argmax order [[louvainCtes]]' verbatim. */
  private def louvainWeightedChain(k: Int, e: String, p: String): String = {
    def level(i: Int): String =
      s"""${p}t$i AS MATERIALIZED (
         |  SELECT l.label AS c, CAST(sum(d.dout) AS BIGINT) AS tout,
         |    CAST(sum(d.din) AS BIGINT) AS tin
         |  FROM ${p}l${i - 1} l JOIN ${p}degs d ON l.node = d.node
         |  GROUP BY l.label
         |), ${p}cand$i AS MATERIALIZED (
         |  SELECT node, c, CAST(sum(kvc) AS BIGINT) AS kvc,
         |    CAST(sum(kcv) AS BIGINT) AS kcv FROM (
         |    SELECT $e.src AS node, l.label AS c, $e.w AS kvc, 0 AS kcv
         |    FROM $e JOIN ${p}l${i - 1} l ON $e.dst = l.node
         |    UNION ALL
         |    SELECT $e.dst, l.label, 0, $e.w
         |    FROM $e JOIN ${p}l${i - 1} l ON $e.src = l.node
         |    UNION ALL
         |    SELECT node, label, 0, 0 FROM ${p}l${i - 1})
         |  GROUP BY node, c
         |), ${p}l$i AS MATERIALIZED (
         |  SELECT node, c AS label FROM (
         |    SELECT cand.node, cand.c,
         |      row_number() OVER (PARTITION BY cand.node ORDER BY
         |        CAST(cand.kvc + cand.kcv AS DOUBLE) / mm.m
         |        - (CAST(d.dout AS DOUBLE)
         |             * CAST(t.tin - CASE WHEN l.label = cand.c
         |                 THEN d.din ELSE 0 END AS DOUBLE)
         |           + CAST(d.din AS DOUBLE)
         |             * CAST(t.tout - CASE WHEN l.label = cand.c
         |                 THEN d.dout ELSE 0 END AS DOUBLE))
         |          / mm.m / mm.m DESC, cand.c ASC) AS rn
         |    FROM ${p}cand$i cand
         |    JOIN ${p}degs d ON cand.node = d.node
         |    JOIN ${p}l${i - 1} l ON cand.node = l.node
         |    JOIN ${p}t$i t ON cand.c = t.c
         |    CROSS JOIN ${p}mm mm)
         |  WHERE rn = 1
         |)""".stripMargin
    s"""${p}douts AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS dout
       |             FROM $e GROUP BY src),
       |${p}dins AS (SELECT dst AS node, CAST(sum(w) AS BIGINT) AS din
       |         FROM $e GROUP BY dst),
       |${p}degs AS MATERIALIZED (
       |  SELECT COALESCE(o.node, i.node) AS node,
       |    COALESCE(o.dout, 0) AS dout, COALESCE(i.din, 0) AS din
       |  FROM ${p}douts o FULL JOIN ${p}dins i ON o.node = i.node
       |), ${p}mm AS MATERIALIZED (
       |  SELECT CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS m FROM $e),
       |${p}l0 AS (SELECT node, node AS label FROM ${p}degs),
       |${(1 to k).map(level).mkString(",\n")}""".stripMargin
  }

  /** Oracle for `graph_louvain_weighted`: the weighted chain over the
    * shared-order-weighted co-purchase edges. */
  private def louvainWeightedOracle(k: Int): String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS (
       |  SELECT a.pk AS src, b.pk AS dst, count(*) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |  GROUP BY a.pk, b.pk
       |),
       |${louvainWeightedChain(k, "e", "v")}
       |SELECT node, label FROM vl$k ORDER BY node""".stripMargin

  /** Oracle for `graph_louvain2` — the genuine TWO-LEVEL Louvain:
    * level-1 unweighted chain (lab1), the coarsened self-looped
    * community graph as e2, the weighted chain over it (prefix `u`),
    * and each node mapped to its community's level-2 label. */
  private def louvain2Oracle(k1: Int, k2: Int): String =
    s"""WITH ${louvainCtes(k1)},
       |lab1 AS MATERIALIZED (SELECT node, label FROM l$k1),
       |e2 AS MATERIALIZED (
       |  SELECT ls.label AS src, ld.label AS dst, count(*) AS w
       |  FROM e JOIN lab1 ls ON e.src = ls.node
       |         JOIN lab1 ld ON e.dst = ld.node
       |  GROUP BY ls.label, ld.label
       |),
       |${louvainWeightedChain(k2, "e2", "u")}
       |SELECT lab1.node AS node, u.label AS label2
       |FROM lab1 JOIN ul$k2 u ON lab1.label = u.node
       |ORDER BY lab1.node""".stripMargin

  /** Oracle for `graph_louvain2_q`: the two-level chain's node-mapped
    * level-2 labels fed through the marginal + integer-sum-total block —
    * [[louvain2Oracle]]'s CTEs composed with [[louvainQOracle]]'s tail,
    * certifying the hierarchy step's Q on the ORIGINAL node graph. */
  private def louvain2QOracle(k1: Int, k2: Int): String =
    s"""WITH ${louvainCtes(k1)},
       |lab1 AS MATERIALIZED (SELECT node, label FROM l$k1),
       |e2 AS MATERIALIZED (
       |  SELECT ls.label AS src, ld.label AS dst, count(*) AS w
       |  FROM e JOIN lab1 ls ON e.src = ls.node
       |         JOIN lab1 ld ON e.dst = ld.node
       |  GROUP BY ls.label, ld.label
       |),
       |${louvainWeightedChain(k2, "e2", "u")},
       |lab AS MATERIALIZED (
       |  SELECT lab1.node AS node, u.label AS label
       |  FROM lab1 JOIN ul$k2 u ON lab1.label = u.node
       |),
       |$modularityMarginalCtes,
       |tot AS (
       |  SELECT CAST(sum(within_edges) AS BIGINT) AS within_total,
       |    CAST(sum(out_degree * in_degree) AS BIGINT) AS degree_product_sum
       |  FROM percom
       |)
       |SELECT m.m AS m, within_total, degree_product_sum,
       |  CAST(within_total AS DOUBLE) / m.m
       |    - CAST(degree_product_sum AS DOUBLE) / m.m / m.m AS q
       |FROM tot CROSS JOIN m""".stripMargin

  /** Oracle for `graph_louvain_q`: the Louvain chain's final labels fed
    * through the SAME marginal + integer-sum-total arithmetic as
    * `graph_modularity_q` — the ascent measurement (compare against the
    * LPA partition's Q on the same graph). */
  private def louvainQOracle(k: Int): String =
    s"""WITH ${louvainCtes(k)},
       |lab AS (SELECT node, label FROM l$k),
       |$modularityMarginalCtes,
       |tot AS (
       |  SELECT CAST(sum(within_edges) AS BIGINT) AS within_total,
       |    CAST(sum(out_degree * in_degree) AS BIGINT) AS degree_product_sum
       |  FROM percom
       |)
       |SELECT m.m AS m, within_total, degree_product_sum,
       |  CAST(within_total AS DOUBLE) / m.m
       |    - CAST(degree_product_sum AS DOUBLE) / m.m / m.m AS q
       |FROM tot CROSS JOIN m""".stripMargin

  /** Oracle for `graph_coarsen`: the Louvain chain's final labels
    * collapsed to the weighted community graph — the mixing-matrix CTE
    * verbatim with self-loops kept (the aggregation-phase convention). */
  private def coarsenOracle(k: Int): String =
    s"""WITH ${louvainCtes(k)},
       |lab AS (SELECT node, label FROM l$k)
       |SELECT ls.label AS src, ld.label AS dst, count(*) AS weight
       |FROM e JOIN lab ls ON e.src = ls.node
       |       JOIN lab ld ON e.dst = ld.node
       |GROUP BY ls.label, ld.label
       |ORDER BY src, dst""".stripMargin

  /** Oracle for `graph_lpa`: k synchronous label-propagation rounds
    * unrolled as a CTE chain (the pageRankOracle technique). Each level
    * replays the engine's update exactly: count in-neighbor labels, then
    * the argmax under the (count DESC, label ASC) total order — all
    * integers, so there is no floating-point to mirror; the window runs
    * over the per-node aggregated label counts (bounded by in-degree),
    * which is the oracle's affordance — the engine side does the same
    * argmax as a partial-aggregated max_by, never a window. */
  /** The co-purchase graph + k synchronous LPA rounds as a reusable WITH
    * body — `lpaOracle` selects the final labels; `modularityOracle`
    * builds the community mixing matrix on top of the same chain. */
  private def lpaCtes(k: Int): String = {
    def level(i: Int): String =
      s"""l$i AS (
         |  SELECT dst AS node, label FROM (
         |    SELECT e.dst, l.label, count(*) AS c,
         |      row_number() OVER (PARTITION BY e.dst
         |        ORDER BY count(*) DESC, l.label) AS rn
         |    FROM e JOIN l${i - 1} l ON e.src = l.node
         |    GROUP BY e.dst, l.label)
         |  WHERE rn = 1
         |)""".stripMargin
    s"""li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |), nodes AS (SELECT DISTINCT dst AS node FROM e),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |${(1 to k).map(level).mkString(",\n")}""".stripMargin
  }

  private def lpaOracle(k: Int): String =
    s"""WITH ${lpaCtes(k)}
       |SELECT node, label FROM l$k ORDER BY node""".stripMargin

  /** Shared WITH body for the two modularity oracles: the LPA(k) labels,
    * the labeled-edge mixing matrix, m derived from it as Σcnt (the
    * engine's one-|E|-scan shape — sum(cnt) → BIGINT → DOUBLE, cast
    * BEFORE the divides, mirrored op-for-op), and the within/out/in
    * marginals. Every count is an integer; the only doubles are the
    * final fixed-shape expressions in the SELECTs, so there is no
    * summation-order ambiguity to mirror. DuckDB sum(BIGINT) returns
    * HUGEINT — every sum is cast back to BIGINT to match Spark's long. */
  /** The mixing-matrix → marginals block, appended after ANY `lab`
    * (node, label) and `e` (src, dst) CTEs — shared by the
    * LPA-partition modularity oracles and the Louvain-partition
    * `graph_louvain_q`. */
  private val modularityMarginalCtes: String =
    """mix AS (
      |  SELECT ls.label AS sl, ld.label AS dl, count(*) AS cnt
      |  FROM e JOIN lab ls ON e.src = ls.node
      |         JOIN lab ld ON e.dst = ld.node
      |  GROUP BY ls.label, ld.label
      |),
      |m AS (SELECT CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE) AS m FROM mix),
      |w AS (SELECT sl AS label, cnt AS within_edges FROM mix WHERE sl = dl),
      |od AS (SELECT sl AS label, CAST(sum(cnt) AS BIGINT) AS out_degree
      |       FROM mix GROUP BY sl),
      |idg AS (SELECT dl AS label, CAST(sum(cnt) AS BIGINT) AS in_degree
      |        FROM mix GROUP BY dl),
      |coms AS (SELECT label, count(*) AS nodes FROM lab GROUP BY label),
      |percom AS (
      |  SELECT coms.label, coms.nodes,
      |    COALESCE(w.within_edges, 0) AS within_edges,
      |    COALESCE(od.out_degree, 0) AS out_degree,
      |    COALESCE(idg.in_degree, 0) AS in_degree
      |  FROM coms
      |  LEFT JOIN w ON coms.label = w.label
      |  LEFT JOIN od ON coms.label = od.label
      |  LEFT JOIN idg ON coms.label = idg.label
      |)""".stripMargin

  private def modularityCtes(k: Int): String =
    s"""${lpaCtes(k)},
       |lab AS (SELECT node, label FROM l$k),
       |$modularityMarginalCtes""".stripMargin

  private def modularityOracle(k: Int): String =
    s"""WITH ${modularityCtes(k)}
       |SELECT label, nodes, within_edges, out_degree, in_degree,
       |  CAST(within_edges AS DOUBLE) / m.m
       |    - CAST(out_degree AS DOUBLE) * CAST(in_degree AS DOUBLE)
       |      / m.m / m.m AS q
       |FROM percom CROSS JOIN m
       |ORDER BY label""".stripMargin

  private def modularityTotalOracle(k: Int): String =
    s"""WITH ${modularityCtes(k)},
       |tot AS (
       |  SELECT CAST(sum(within_edges) AS BIGINT) AS within_total,
       |    CAST(sum(out_degree * in_degree) AS BIGINT) AS degree_product_sum
       |  FROM percom
       |)
       |SELECT m.m AS m, within_total, degree_product_sum,
       |  CAST(within_total AS DOUBLE) / m.m
       |    - CAST(degree_product_sum AS DOUBLE) / m.m / m.m AS q
       |FROM tot CROSS JOIN m""".stripMargin

  /** Oracle for `graph_bfs`: k level-synchronous frontier expansions
    * unrolled as a CTE chain (the lpaOracle technique). Level i selects
    * the distinct successors of level i−1 not yet seen at ANY earlier
    * level — exactly the engine's distinct + anti-join step; everything
    * is integer, so the chain replays the loop bit-for-bit. */
  private def bfsOracle(k: Int): String = {
    def seen(i: Int): String =
      (0 until i).map(j => s"SELECT node FROM d$j").mkString(" UNION ALL ")
    def level(i: Int): String =
      s"""d$i AS (
         |  SELECT DISTINCT e.dst AS node, CAST($i AS BIGINT) AS dist
         |  FROM e JOIN d${i - 1} f ON e.src = f.node
         |  WHERE e.dst NOT IN (${seen(i)})
         |)""".stripMargin
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |), s AS (SELECT min(src) AS sn FROM e),
       |d0 AS (SELECT sn AS node, CAST(0 AS BIGINT) AS dist FROM s),
       |${(1 to k).map(level).mkString(",\n")}
       |SELECT node, dist FROM (${(0 to k).map(j => s"SELECT * FROM d$j")
          .mkString(" UNION ALL ")})
       |ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_sssp`: k Bellman–Ford relaxation rounds unrolled
    * as a CTE chain (the bfsOracle technique). Level i takes the
    * per-node integer min over the standing distances unioned with every
    * one-edge relaxation — exactly the engine's union + min-aggregate
    * step; weights and costs are all BIGINT, so the chain replays the
    * loop bit-for-bit. The weight 11 − least(shared_orders, 10) makes
    * strongly co-purchased parts cheap to traverse (cost ∈ [1, 10]). */
  private def ssspOracle(k: Int): String = {
    def level(i: Int): String =
      s"""d$i AS (
         |  SELECT node, min(cost) AS cost FROM (
         |    SELECT node, cost FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, f.cost + e.w AS cost
         |    FROM e JOIN d${i - 1} f ON e.src = f.node
         |  ) GROUP BY node
         |)""".stripMargin
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS (
       |  SELECT a.pk AS src, b.pk AS dst,
       |    CAST(11 - least(count(*), 10) AS BIGINT) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |  GROUP BY a.pk, b.pk
       |), s AS (SELECT min(src) AS sn FROM e),
       |d0 AS (SELECT sn AS node, CAST(0 AS BIGINT) AS cost FROM s),
       |${(1 to k).map(level).mkString(",\n")}
       |SELECT node, cost FROM d$k ORDER BY node""".stripMargin
  }

  /** Shared CTE base for `graph_kcore`/`graph_components`: the SPARSE
    * co-purchase graph — parts sharing ≥ 2 distinct orders, symmetrized.
    * Sparser than the pagerank/lpa graph on purpose: the support
    * threshold splits it into many components (2350 at sf0.1) and gives
    * the peel real work (5922 → 7 surviving nodes at sf0.1), where the
    * ≥ 1 graph is one near-clique both operators would pass through
    * untouched. */
  private val strongCoPurchaseCte: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), pr AS (
      |  SELECT a.pk AS s, b.pk AS d
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY a.pk, b.pk HAVING count(*) >= 2
      |), e AS (
      |  SELECT s AS src, d AS dst FROM pr
      |  UNION ALL SELECT d, s FROM pr
      |)""".stripMargin

  /** Oracle for `graph_kcore`: `rounds` synchronous peel rounds unrolled
    * as a CTE chain. Level i recomputes every survivor's degree within
    * the surviving subgraph (two semi-joins onto s_{i−1} + a count) and
    * keeps nodes at ≥ k — exactly the engine's round; degrees and ids
    * are all BIGINT, so the chain replays the peel bit-for-bit. */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    def level(i: Int): String =
      s"""d$i AS (
         |  SELECT e.src AS node, CAST(count(*) AS BIGINT) AS deg
         |  FROM e JOIN s${i - 1} a ON e.src = a.node
         |         JOIN s${i - 1} b ON e.dst = b.node
         |  GROUP BY e.src HAVING count(*) >= $k
         |), s$i AS (SELECT node FROM d$i)""".stripMargin
    s"""$strongCoPurchaseCte,
       |s0 AS (SELECT DISTINCT src AS node FROM e),
       |${(1 to rounds).map(i => level(i)).mkString(",\n")}
       |SELECT node, deg FROM d$rounds ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_corenum`: `rounds` h-index iterations (Lü et al.
    * 2016 — h₀ = degree, hₜ₊₁(v) = h-index of neighbors' hₜ, convergent
    * to coreness) unrolled as a CTE chain over [[strongCoPurchaseCte]].
    * Each level replays the engine's threshold-counting h-index exactly:
    * per edge, candidate thresholds k = 1..min(hₜ(src), hₜ(dst))
    * (truncation lossless — the iteration is non-increasing), count per
    * (node, k), keep counts ≥ k, max k; nodes with no qualifying k
    * coalesce to 0 from the h0 node universe. All BIGINT — the chain
    * replays bit-for-bit.
    *
    * Every h level and the edge base are AS MATERIALIZED: each level
    * references its predecessor TWICE (both endpoint joins), so DuckDB's
    * default CTE inlining would expand the 20-level chain into 2²⁰
    * copies of the base scan (measured: "too many open files" before
    * the hint, instant after). */
  private def coreNumbersOracle(rounds: Int): String = {
    def level(i: Int): String =
      s"""c$i AS (
         |  SELECT node, unnest(generate_series(CAST(1 AS BIGINT), mh)) AS k
         |  FROM (SELECT em.src AS node, least(a.h, b.h) AS mh
         |        FROM em JOIN h${i - 1} a ON em.src = a.node
         |               JOIN h${i - 1} b ON em.dst = b.node
         |        WHERE least(a.h, b.h) >= 1)
         |), m$i AS (
         |  SELECT node, CAST(max(k) AS BIGINT) AS h
         |  FROM (SELECT node, k, count(*) AS c FROM c$i GROUP BY node, k)
         |  WHERE c >= k GROUP BY node
         |), h$i AS MATERIALIZED (
         |  SELECT n.node, COALESCE(m.h, CAST(0 AS BIGINT)) AS h
         |  FROM (SELECT node FROM h0) n LEFT JOIN m$i m ON n.node = m.node
         |)""".stripMargin
    s"""$strongCoPurchaseCte,
       |em AS MATERIALIZED (SELECT src, dst FROM e),
       |h0 AS MATERIALIZED (
       |  SELECT src AS node, CAST(count(*) AS BIGINT) AS h
       |  FROM em GROUP BY src),
       |${(1 to rounds).map(level).mkString(",\n")}
       |SELECT node, h AS core FROM h$rounds ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_mis`: k Luby rounds unrolled as a CTE chain over
    * the symmetrized strong co-purchase edges. The MINSTD priority
    * ((v % P) · 48271) % P with P = 2³¹−1 is exact BIGINT in both
    * engines (products < 2⁴⁷); the per-node min-(p, id) undecided
    * neighbor comes from a row_number window (the oracle's affordance —
    * the engine does the same argmin as a partial-agg `min(struct)`,
    * never a window); undecided/MIS/dominated sets thread level to
    * level as EXCEPT/UNION chains, all MATERIALIZED (each level is
    * referenced several times — the corenum inlining lesson). */
  private def misOracle(k: Int): String = {
    val P = "2147483647"
    def pr(c: String) = s"(($c % $P) * 48271) % $P"
    def level(i: Int): String =
      s"""nbr$i AS MATERIALIZED (
         |  SELECT t.dst AS node, t.p AS np, t.u AS nu FROM (
         |    SELECT e.dst, ${pr("e.src")} AS p, e.src AS u,
         |      row_number() OVER (PARTITION BY e.dst
         |        ORDER BY ${pr("e.src")}, e.src) AS rn
         |    FROM e JOIN u${i - 1} a ON e.src = a.node
         |           JOIN u${i - 1} b ON e.dst = b.node) t
         |  WHERE rn = 1
         |), nm$i AS MATERIALIZED (
         |  SELECT u.node FROM u${i - 1} u LEFT JOIN nbr$i n ON u.node = n.node
         |  WHERE n.node IS NULL
         |     OR ${pr("u.node")} < n.np
         |     OR (${pr("u.node")} = n.np AND u.node < n.nu)
         |), dm$i AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS node
         |  FROM e JOIN nm$i m ON e.src = m.node
         |         JOIN u${i - 1} x ON e.dst = x.node
         |), u$i AS MATERIALIZED (
         |  SELECT node FROM u${i - 1}
         |  EXCEPT SELECT node FROM nm$i
         |  EXCEPT SELECT node FROM dm$i
         |), m$i AS MATERIALIZED (
         |  SELECT node FROM m${i - 1} UNION ALL SELECT node FROM nm$i
         |), d$i AS MATERIALIZED (
         |  SELECT node FROM d${i - 1} UNION ALL SELECT node FROM dm$i
         |)""".stripMargin
    s"""$strongCoPurchaseCte,
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
       |u0 AS (SELECT node FROM nodes),
       |m0 AS (SELECT node FROM nodes WHERE 1 = 0),
       |d0 AS (SELECT node FROM nodes WHERE 1 = 0),
       |${(1 to k).map(level).mkString(",\n")}
       |SELECT n.node,
       |  CAST(CASE WHEN m.node IS NOT NULL THEN 2
       |            WHEN dd.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS status
       |FROM nodes n
       |LEFT JOIN m$k m ON n.node = m.node
       |LEFT JOIN d$k dd ON n.node = dd.node
       |ORDER BY n.node""".stripMargin
  }

  /** Oracle for `graph_closeness`: k multi-source BFS levels unrolled as
    * a CTE chain over [[strongCoPurchaseCte]] (the bfsOracle min-over-
    * relaxations technique with a seed column — level i's per-(seed,
    * node) integer min over the standing distances unioned with every
    * one-hop relaxation equals the engine's first-reach BFS distance),
    * then the per-(seed, dist) integer census and the cnt/dist harmonic
    * fold in dist order — fold state ≤ k terms per seed, every division
    * mirrored. Seeds = the 4 smallest source nodes (the graph_ppr
    * convention). */
  private def closenessOracle(k: Int, nSeeds: Int): String = {
    def level(i: Int): String =
      s"""d$i AS MATERIALIZED (
         |  SELECT seed, node, min(dist) AS dist FROM (
         |    SELECT seed, node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT f.seed, e.dst AS node, f.dist + 1 AS dist
         |    FROM e JOIN d${i - 1} f ON e.src = f.node
         |  ) GROUP BY seed, node
         |)""".stripMargin
    s"""$strongCoPurchaseCte,
       |seeds AS (SELECT src AS node FROM e GROUP BY src ORDER BY src LIMIT $nSeeds),
       |d0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist FROM seeds),
       |${(1 to k).map(level).mkString(",\n")},
       |census AS (
       |  SELECT seed, dist, CAST(count(*) AS BIGINT) AS cnt
       |  FROM d$k WHERE dist > 0 GROUP BY seed, dist
       |)
       |SELECT seed, CAST(sum(cnt) AS BIGINT) AS n_reached,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_sort(list(struct_pack(dist := dist, cnt := cnt))),
       |      x -> CAST(x.cnt AS DOUBLE) / CAST(x.dist AS DOUBLE))),
       |    (a, v) -> a + v) AS harmonic
       |FROM census GROUP BY seed ORDER BY seed""".stripMargin
  }

  /** Oracle for `graph_diameter_lb`: TWO unrolled BFS chains (the
    * bfsOracle min-over-relaxations technique) over
    * [[strongCoPurchaseCte]] — sweep 1 from the min source, the
    * farthest node under (dist DESC, node) picked by ORDER/LIMIT (the
    * oracle's affordance — the engine's argmax is a partial-agg
    * max_by), sweep 2 from it; the four output scalars are subquery
    * reads of the two final levels. All BIGINT. */
  private def diameterLbOracle(k: Int): String = {
    def level(p: String, i: Int): String =
      s"""$p$i AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM $p${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, f.dist + 1 AS dist
         |    FROM e JOIN $p${i - 1} f ON e.src = f.node
         |  ) GROUP BY node
         |)""".stripMargin
    s"""$strongCoPurchaseCte,
       |s AS (SELECT min(src) AS u FROM e),
       |d0 AS (SELECT u AS node, CAST(0 AS BIGINT) AS dist FROM s),
       |${(1 to k).map(i => level("d", i)).mkString(",\n")},
       |wn AS MATERIALIZED (
       |  SELECT node AS w FROM d$k ORDER BY dist DESC, node LIMIT 1),
       |g0 AS (SELECT w AS node, CAST(0 AS BIGINT) AS dist FROM wn),
       |${(1 to k).map(i => level("g", i)).mkString(",\n")}
       |SELECT (SELECT u FROM s) AS u,
       |  (SELECT max(dist) FROM d$k) AS ecc_u,
       |  (SELECT w FROM wn) AS w,
       |  (SELECT max(dist) FROM g$k) AS diameter_lb""".stripMargin
  }

  /** Oracle for `graph_stress`: k multi-source BFS-with-path-counting
    * levels unrolled as a CTE chain over [[strongCoPurchaseCte]] —
    * level i's frontier relaxation sums predecessor σ per (seed, node)
    * (every predecessor of a dist-i node sits at dist i−1, so the
    * frontier-only sum IS the σ recurrence), anti-joined against the
    * standing visited set — then the seed-pair distances read off the
    * visited frame and the through-count combine
    * σ_s(v)·σ_t(v) · [d_s(v)+d_t(v) = d(s,t)]. All BIGINT. Every level
    * is referenced twice or more → AS MATERIALIZED (the corenum
    * lesson). Seeds = the `nSeeds` smallest source nodes (the
    * graph_ppr convention). */
  private def stressOracle(k: Int, nSeeds: Int): String = {
    def level(i: Int): String =
      s"""f$i AS MATERIALIZED (
         |  SELECT x.seed, x.node, CAST($i AS BIGINT) AS dist, x.sigma
         |  FROM (
         |    SELECT f.seed, e.dst AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
         |    FROM e JOIN n${i - 1} f ON e.src = f.node
         |    GROUP BY f.seed, e.dst
         |  ) x LEFT JOIN v${i - 1} v ON x.seed = v.seed AND x.node = v.node
         |  WHERE v.node IS NULL
         |), n$i AS MATERIALIZED (
         |  SELECT seed, node, sigma FROM f$i
         |), v$i AS MATERIALIZED (
         |  SELECT seed, node, dist, sigma FROM v${i - 1}
         |  UNION ALL SELECT seed, node, dist, sigma FROM f$i
         |)""".stripMargin
    s"""$strongCoPurchaseCte,
       |seeds AS MATERIALIZED (
       |  SELECT src AS node FROM e GROUP BY src ORDER BY src LIMIT $nSeeds),
       |v0 AS MATERIALIZED (
       |  SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist,
       |    CAST(1 AS BIGINT) AS sigma FROM seeds),
       |n0 AS MATERIALIZED (SELECT seed, node, sigma FROM v0),
       |${(1 to k).map(level).mkString(",\n")},
       |dp AS MATERIALIZED (
       |  SELECT seed AS s, node AS t, dist AS d FROM v$k
       |  WHERE node IN (SELECT node FROM seeds) AND seed < node
       |),
       |th AS (
       |  SELECT a.node, a.sigma * b.sigma AS sg
       |  FROM dp JOIN v$k a ON a.seed = dp.s
       |          JOIN v$k b ON b.seed = dp.t AND b.node = a.node
       |  WHERE a.dist + b.dist = dp.d AND a.node <> dp.s AND a.node <> dp.t
       |)
       |SELECT node, CAST(sum(sg) AS BIGINT) AS stress
       |FROM th GROUP BY node ORDER BY node""".stripMargin
  }

  /** Oracle for `graph_mst`: k synchronous Borůvka rounds unrolled as a
    * CTE chain over the WEIGHTED strong co-purchase pairs (w = 11 −
    * least(shared orders, 10) — the graph_sssp weights on the
    * graph_components edge set). Per level: label both endpoints from the
    * previous round, drop intra-component edges, take each component's
    * min incident edge under the total order (w, a, b) via row_number
    * (the oracle's affordance — the engine's argmin is a partial-agg
    * `min(struct)`, never a window), DISTINCT the both-sided picks, then
    * contract the ≤C selected edges with a nested recursive
    * min-reachable CTE (the componentsOracle technique — the same
    * min-label fixpoint the engine's pointer-jumping union-find
    * computes) and relabel. All BIGINT — the chain replays every round
    * bit-for-bit on any corpus; every multiply-referenced level is
    * AS MATERIALIZED (the corenum inlining lesson). */
  private def mstOracle(k: Int): String =
    mstChain(k) +
      s"""
         |SELECT round, a, b, w FROM (
         |  ${(1 to k).map(i =>
              s"SELECT CAST($i AS BIGINT) AS round, a, b, w FROM ch$i")
              .mkString("\n  UNION ALL ")}
         |) ORDER BY a, b""".stripMargin

  /** Oracle for `graph_mst_ivm`: the FROM-SCRATCH minimum spanning
    * forest of the WHOLE weighted graph (round tags dropped — the
    * incremental engine's rounds differ from the from-scratch ones; the
    * edge SET is what the sparsification theorem equates). A hash match
    * against the engine's MST(MST(base) ∪ Δ) IS the theorem — the
    * agg_incremental / graph_components_ivm certification pattern. */
  private def mstIvmOracle(k: Int): String =
    mstChain(k) +
      s"""
         |SELECT a, b, w FROM (
         |  ${(1 to k).map(i => s"SELECT a, b, w FROM ch$i")
              .mkString("\n  UNION ALL ")}
         |) ORDER BY a, b""".stripMargin

  private def mstChain(k: Int): String = {
    def level(i: Int): String =
      s"""ec$i AS MATERIALIZED (
         |  SELECT e.a, e.b, e.w, la.l AS ca, lb.l AS cb
         |  FROM e JOIN lab${i - 1} la ON e.a = la.node
         |         JOIN lab${i - 1} lb ON e.b = lb.node
         |  WHERE la.l <> lb.l
         |), ch$i AS MATERIALIZED (
         |  SELECT DISTINCT w, a, b, ca, cb FROM (
         |    SELECT t.w, t.a, t.b, t.ca, t.cb,
         |      row_number() OVER (PARTITION BY t.comp ORDER BY t.w, t.a, t.b) AS rn
         |    FROM (SELECT ca AS comp, w, a, b, ca, cb FROM ec$i
         |          UNION ALL SELECT cb, w, a, b, ca, cb FROM ec$i) t)
         |  WHERE rn = 1
         |), mg$i AS MATERIALIZED (
         |  WITH RECURSIVE rr(c0, c) AS (
         |    SELECT DISTINCT s, s FROM (SELECT ca AS s FROM ch$i
         |                               UNION ALL SELECT cb FROM ch$i)
         |    UNION
         |    SELECT rr.c0, x.d FROM rr JOIN (SELECT ca AS s, cb AS d FROM ch$i
         |                                    UNION ALL SELECT cb, ca FROM ch$i) x
         |      ON rr.c = x.s
         |  ) SELECT c0 AS comp, CAST(min(c) AS BIGINT) AS nl FROM rr GROUP BY c0
         |), lab$i AS MATERIALIZED (
         |  SELECT l.node, coalesce(m.nl, l.l) AS l
         |  FROM lab${i - 1} l LEFT JOIN mg$i m ON l.l = m.comp
         |)""".stripMargin
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e AS MATERIALIZED (
       |  SELECT x.pk AS a, y.pk AS b,
       |    CAST(11 - least(count(*), 10) AS BIGINT) AS w
       |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
       |  GROUP BY x.pk, y.pk HAVING count(*) >= 2
       |), lab0 AS MATERIALIZED (
       |  SELECT node, node AS l
       |  FROM (SELECT a AS node FROM e UNION SELECT b FROM e)
       |),
       |${(1 to k).map(level).mkString(",\n")}""".stripMargin
  }

  /** Oracle for `graph_components`: min-reachable-id per node via a
    * recursive CTE over the symmetrized edge set (the fuzzy_clusters
    * technique). In an undirected graph the reach set IS the component,
    * and the min label is a unique fixpoint independent of iteration
    * order — which is why the engine's pointer-jumping union-find
    * (O(log diameter) rounds) and the oracle's one-hop recursion
    * (O(diameter) rounds) provably agree. */
  private val componentsOracle: String =
    s"""$strongCoPurchaseCte,
       |reach AS (
       |  WITH RECURSIVE r(n0, node) AS (
       |    SELECT DISTINCT src, src FROM e
       |    UNION
       |    SELECT r.n0, e2.dst FROM r JOIN e e2 ON r.node = e2.src
       |  ) SELECT n0, CAST(min(node) AS BIGINT) AS component
       |  FROM r GROUP BY n0
       |)
       |SELECT n0 AS node, component FROM reach ORDER BY node""".stripMargin

  /** Oracle for `graph_ktruss`: `rounds` unrolled peel levels over
    * [[strongCoPurchaseCte]]'s canonical pairs — per level the a<b<c
    * triangle join on the surviving edge set, support attributed to all
    * three edges, edges kept at support ≥ k−2; every e-level
    * AS MATERIALIZED (each is referenced three times by its triangle
    * join — the corenum inlining lesson). Output: (round, n_edges). */
  private def kTrussOracle(k: Int, rounds: Int): String = {
    def level(r: Int) =
      s"""tri$r AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e${r - 1} e1 JOIN e${r - 1} e2 ON e1.b = e2.a
         |       JOIN e${r - 1} e3 ON e3.a = e1.a AND e3.b = e2.b
         |), sup$r AS (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT x AS a, y AS b FROM tri$r
         |    UNION ALL SELECT x, z FROM tri$r
         |    UNION ALL SELECT y, z FROM tri$r)
         |  GROUP BY a, b
         |), e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN sup$r s ON e.a = s.a AND e.b = s.b
         |  WHERE s.cnt >= ${k - 2}
         |)""".stripMargin
    strongCoPurchaseCte +
      s""", e0 AS MATERIALIZED (SELECT s AS a, d AS b FROM pr),
         |${(1 to rounds).map(level).mkString(",\n")}
         |${(1 to rounds).map(r =>
            s"SELECT CAST($r AS BIGINT) AS round, " +
              s"(SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_edges")
            .mkString("\nUNION ALL\n")}
         |ORDER BY round""".stripMargin
  }

  /** Engine twin of [[strongCoPurchaseCte]]'s `pr`: one-directional
    * (s < d) part pairs sharing ≥ 2 distinct orders. */
  private def strongCoPurchasePairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.select(col("ok"), col("pk").as("s"))
      .join(li.select(col("ok"), col("pk").as("d")), "ok")
      .filter(col("s") < col("d"))
      .groupBy("s", "d").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select("s", "d")
  }

  /** [[strongCoPurchasePairs]] with the graph_sssp weight attached:
    * (a, b, w) canonical pairs, w = 11 − least(shared orders, 10) ∈
    * [1, 9] — strongly co-purchased parts are cheap to span. */
  private def strongCoPurchaseWeightedPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.select(col("ok"), col("pk").as("a"))
      .join(li.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("a"), col("b"),
        (lit(11L) - least(col("cnt"), lit(10L))).as("w"))
  }

  /** [[strongCoPurchasePairs]] symmetrized to (src, dst) both ways —
    * the edge set the oracle's `e` CTE spells. */
  private def strongCoPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val pr = strongCoPurchasePairs(s, dir)
    pr.select(col("s").as("src"), col("d").as("dst"))
      .unionAll(pr.select(col("d").as("src"), col("s").as("dst")))
  }

  /** Deliberately-skewed fact: every even orderkey maps to skew_key 0 (50%
    * of lineitem — 300k rows at sf0.1 on one key), the rest spread over
    * 1..199. qty is exact (l_quantity is integer-valued; summed as BIGINT
    * so no double-order sensitivity). */
  private def skewFact(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.lineitem(s, dir).select(
      when(pmod(col("l_orderkey"), lit(2)) === 0, lit(0L))
        .otherwise(pmod(col("l_partkey"), lit(200L))).as("skew_key"),
      col("l_quantity").cast("long").as("qty"))

  /** Salt-ready variant of [[skewFact]]: carries the fact's natural key
    * (l_orderkey, l_linenumber) through to the salted join so the
    * content-derived salt hashes a HIGH-CARDINALITY row. Salting the
    * projected (skew_key, qty) pair would collapse the hot key's 300k rows
    * onto ~50 distinct hash inputs (qty has ~50 values) — the degenerate
    * case Salt's scaladoc warns about: salt BEFORE projecting away the
    * discriminating columns. The extra columns are pruned right after the
    * salt is computed (they feed nothing downstream). */
  private def skewFactSaltable(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.lineitem(s, dir).select(
      when(pmod(col("l_orderkey"), lit(2)) === 0, lit(0L))
        .otherwise(pmod(col("l_partkey"), lit(200L))).as("skew_key"),
      col("l_quantity").cast("long").as("qty"),
      col("l_orderkey"), col("l_linenumber"))

  private def skewDim(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.part(s, dir)
      .groupBy(pmod(col("p_partkey"), lit(200L)).as("skew_key"))
      .agg(max("p_name").as("dim_name"))

  /** Batch sessionization core shared by events_sessions and
    * events_session_assign: per-user events with a session number (new
    * session at > 30 min of event-time silence). Columns: user_id,
    * event_id, us, sess_no. */
  private def sessionized(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "new_sess")
  }

  private val skewOracle: String =
    """WITH f AS (
      |  SELECT CASE WHEN l_orderkey % 2 = 0 THEN CAST(0 AS BIGINT)
      |              ELSE l_partkey % 200 END AS skew_key,
      |         CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem
      |), d AS (
      |  SELECT p_partkey % 200 AS skew_key, max(p_name) AS dim_name
      |  FROM part GROUP BY 1
      |)
      |SELECT f.skew_key, CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(f.qty) AS BIGINT) AS sum_qty, max(d.dim_name) AS dim_name
      |FROM f JOIN d USING (skew_key)
      |GROUP BY f.skew_key ORDER BY skew_key""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: multi-aggregate groupBy with arithmetic expressions.
    QueryDef.of("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        // to_timestamp parses in the session TZ (UTC) — avoids the JVM-default
        // zone that java.sql.Timestamp.valueOf would use.
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Broadcast join: fact × small dim. part is tiny relative to lineitem at
    // every SF — explicit broadcast() hint keeps the plan shuffle-free on the
    // dim side regardless of autoBroadcastJoinThreshold.
    QueryDef.of("join_broadcast",
      """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },

    // Multi-way join through the dimension chain (customer→nation→region),
    // dims broadcast, fact aggregated AFTER a partial pre-aggregation on the
    // join key — at 100 TB the pre-agg shrinks the shuffle by orders of
    // magnitude vs joining raw orders rows.
    QueryDef.of("join_multi",
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS total_spend,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val perCust = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum("o_totalprice").as("spend"), count(lit(1)).as("n_ord"))
      perCust
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum("spend"), 2).as("total_spend"), sum("n_ord").as("n_orders"))
        .orderBy("r_name", "n_name")
    },

    // Left-semi join (EXISTS): customers having at least one F-status order.
    QueryDef.of("semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Left-anti join (NOT EXISTS): customers with no P-status order — a
    // predicate that yields a non-empty result at every SF, so the oracle
    // hash check is non-trivial (every customer has *some* order).
    QueryDef.of("anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Full-outer join (completes the join surface: inner/broadcast/multi,
    // semi, anti, and now both-sides null extension). BUILDING-segment
    // customers against per-customer P-status order aggregates: P is the
    // rare status and BUILDING one of five segments, so BOTH null branches
    // are non-empty at every SF (customer with no P orders; P orders from
    // a non-BUILDING customer). Aggregate-before-join keeps the outer join
    // one-row-per-key on both sides — the 100 TB shape (no fact-side
    // row explosion through the null-extending join).
    QueryDef.of("outer_join",
      """WITH c AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        |), o AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |    round(sum(o_totalprice), 2) AS spend
        |  FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
        |)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, n_orders, spend
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "P")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"), col("spend"))
        .orderBy("custkey")
    },

    // Window ranking: top-3 spenders per nation. Aggregate first (shrinks the
    // window input to one row per customer), then rank within nation.
    QueryDef.of("window_rank",
      """SELECT n_name, c_name, spend, rk FROM (
        |  SELECT n_name, c_name, round(sum(o_totalprice), 2) AS spend,
        |    CAST(row_number() OVER (PARTITION BY n_name
        |      ORDER BY round(sum(o_totalprice), 2) DESC, c_name) AS BIGINT) AS rk
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, c_name
        |) WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin) { (s, dir) =>
      val spend = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "c_name")
        .agg(round(sum("o_totalprice"), 2).as("spend"))
      val w = Window.partitionBy("n_name").orderBy(col("spend").desc, col("c_name").asc)
      spend
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("n_name", "c_name", "spend", "rk")
        .orderBy("n_name", "rk")
    },

    // Running (cumulative) window: per-customer running order spend over time.
    QueryDef.of("window_running",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ROLLUP: hierarchical subtotals (flag → flag+status → grand total).
    QueryDef.of("rollup_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // GROUPING SETS: caller-chosen set list — the general form ROLLUP and
    // CUBE specialize ((rf, ls), (ls), ()) here, deliberately NOT the
    // rollup chain). Exact integer sums (quantity is integer-valued), so
    // no rounding anywhere; NULLS FIRST pinned on both sides.
    QueryDef.of("grouping_sets_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Inter-arrival time histogram: per-user lag deltas (the unique
    // (µs, event_id) order), bucketed to minutes — all exact integer
    // arithmetic (deltas nonneg, so Spark `div` ≡ DuckDB `//`). The lag
    // window is the bounded per-user sessionization class; the histogram
    // domain is |buckets|, partial-aggregated map-side.
    QueryDef.of("events_interarrival",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
        |), d AS (
        |  SELECT us - lag(us) OVER (
        |    PARTITION BY user_id ORDER BY us, event_id) AS delta
        |  FROM e
        |)
        |SELECT CAST(delta // 60000000 AS BIGINT) AS minute_bucket,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM d WHERE delta IS NOT NULL
        |GROUP BY 1 ORDER BY minute_bucket""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("delta", col("us") - lag("us", 1).over(w))
        .filter(col("delta").isNotNull)
        .groupBy(expr("delta div 60000000").as("minute_bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("minute_bucket")
    },

    // CUBE: all grouping-set combinations.
    QueryDef.of("cube_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_extendedprice"), 2).as("sum_price"), count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // DISTINCT (the reference has none — SURVEY.md §2.14).
    QueryDef.of("distinct_vals",
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // Data-quality profiling: the per-column shape report (rows / nulls /
    // distincts / range) every ingest run starts with, one row per
    // profiled column. Numeric min/max ship as DOUBLE columns and string
    // min/max as separate STRING columns — never numbers formatted into
    // strings, where engines' float printing diverges. One pass per
    // column over the same scan, unioned; count(DISTINCT) is exact.
    QueryDef.of("table_profile",
      """SELECT 'o_custkey' AS name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_custkey) AS DOUBLE) AS min_num, CAST(max(o_custkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |  min(o_totalprice), max(o_totalprice), NULL, NULL
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  NULL, NULL, min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |ORDER BY name""".stripMargin) { (s, dir) =>
      // ONE scan for the whole profile (a union of per-column aggregates
      // would read the table once per column — three full reads at
      // 100 TB): every column's stats in a single aggregate (Spark plans
      // the multi-column DISTINCTs via one Expand over one scan), then
      // the 1-row result explodes into one row per column. PlanSpec pins
      // the single scan.
      val a = Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("ck_null"),
        countDistinct(col("o_custkey")).as("ck_distinct"),
        min(col("o_custkey")).cast("double").as("ck_min"),
        max(col("o_custkey")).cast("double").as("ck_max"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("tp_null"),
        countDistinct(col("o_totalprice")).as("tp_distinct"),
        min(col("o_totalprice")).cast("double").as("tp_min"),
        max(col("o_totalprice")).cast("double").as("tp_max"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("os_null"),
        countDistinct(col("o_orderstatus")).as("os_distinct"),
        min(col("o_orderstatus")).as("os_min"),
        max(col("o_orderstatus")).as("os_max"))
      val nullD = lit(null).cast("double")
      val nullS = lit(null).cast("string")
      a.select(explode(array(
          struct(lit("o_custkey").as("name"), col("n_rows"),
            col("ck_null").as("n_null"), col("ck_distinct").as("n_distinct"),
            col("ck_min").as("min_num"), col("ck_max").as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("o_totalprice").as("name"), col("n_rows"),
            col("tp_null").as("n_null"), col("tp_distinct").as("n_distinct"),
            col("tp_min").as("min_num"), col("tp_max").as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("o_orderstatus").as("name"), col("n_rows"),
            col("os_null").as("n_null"), col("os_distinct").as("n_distinct"),
            nullD.as("min_num"), nullD.as("max_num"),
            col("os_min").as("min_str"), col("os_max").as("max_str")))).as("r"))
        .select(col("r.*"))
        .orderBy("name")
    },

    // Top-k by value with deterministic tie-break. Spark plans this as
    // TakeOrderedAndProject — no global sort materialization.
    QueryDef.of("topk",
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // Skewed join, UNSALTED baseline: 50% of the fact lands on one key
    // (every even orderkey → skew_key 0), dim joined via sort-merge (hinted
    // — at real dim sizes broadcast is off the table, which is exactly when
    // skew bites). One task owns the hot key's 300k rows. Same oracle as
    // join_skew_salted: the two must be value-identical.
    QueryDef.of("join_skew_plain", skewOracle) { (s, dir) =>
      skewFact(s, dir).join(skewDim(s, dir).hint("merge"), "skew_key")
        .groupBy("skew_key")
        .agg(count(lit(1)).as("cnt"),
          sum("qty").as("sum_qty"), max("dim_name").as("dim_name"))
        .orderBy("skew_key")
    },

    // The same skewed join through Salt.saltedJoinAgg: fact rows get a
    // content-derived salt in [0,16), the dim replicates ×16, the join key
    // becomes (key, salt) — the hot key's rows spread over 16 tasks instead
    // of pinning one. Oracle-checked equal to the unsalted baseline.
    QueryDef.of("join_skew_salted", skewOracle) { (s, dir) =>
      graft.operators.Salt.saltedJoinAgg(
          skewFactSaltable(s, dir), skewDim(s, dir).hint("merge"), "skew_key",
          Seq("skew_key"),
          Seq(count(lit(1)).as("cnt"),
            sum("qty").as("sum_qty"), max("dim_name").as("dim_name")))
        .orderBy("skew_key")
    },

    // JSON extraction from the events props column + aggregate per type.
    QueryDef.of("events_json",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(avg(value), 2) AS avg_value, CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), round(avg("value"), 2).as("avg_value"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    // Sessionization (batch form): per-user sessions split at >30-minute
    // gaps — lag to mark boundaries, running sum to number sessions, then
    // per-session aggregates. The window partitions by user_id (bounded by
    // per-user activity, the natural sessionization key at any scale).
    // Exact integer microseconds on both sides: Spark's µs timestamps and
    // DuckDB's epoch_us agree bit-for-bit. The streaming twin with custom
    // state + event-time timeout is graft.streaming.EventsStreaming
    // .sessionize (agreement asserted in StreamingSpec).
    QueryDef.of("events_sessions",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |), m AS (
        |  SELECT user_id, us, event_id,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT user_id, us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM m
        |)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
        |FROM s GROUP BY user_id, sess_no
        |ORDER BY user_id, sess_no""".stripMargin) { (s, dir) =>
      sessionized(s, dir)
        .groupBy("user_id", "sess_no")
        .agg(count(lit(1)).as("n_events"),
          (max("us") - min("us")).as("duration_us"))
        .orderBy("user_id", "sess_no")
    },

    // Tumbling event-time window (batch form): hourly counts per event type.
    // The streaming form of the same aggregation lives in
    // graft.streaming.EventsStreaming (same logical plan under readStream).
    QueryDef.of("events_window",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, CAST(count(*) AS BIGINT) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour_start", "event_type")
    },

    // Hourly DISTINCT-user counts — the unique-reach metric next to
    // events_window's volume counts, and the oracle-checked batch twin of
    // EventsStreaming.hourlyDistinctUsers (whose StreamingSpec asserts
    // the streaming dedup-then-aggregate composition equals exactly this
    // countDistinct spelling). Spark plans countDistinct as the two-phase
    // distinct aggregation (partial distinct per partition before the
    // shuffle) — never a window, scales as the number of distinct
    // (hour, user) pairs.
    QueryDef.of("events_distinct_users",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour_start"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("hour_start")
    },

    // Hopping (sliding) window aggregation: 1-hour windows every 30
    // minutes — each event lands in exactly duration/slide = 2 windows.
    // Spark's window() aligns starts to the epoch modulo the slide (UTC
    // session), so the oracle replays the assignment with integer
    // microsecond arithmetic: the two starts are floor(us/30min)*30min
    // and that minus one slide. Window starts ship as unix_micros BIGINTs
    // (the established events-tier timestamp currency — see events_asof).
    QueryDef.of("events_hopping",
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, event_type, value FROM events
        |), x AS (
        |  SELECT event_type, value,
        |    unnest([(us // 1800000000) * 1800000000,
        |            (us // 1800000000) * 1800000000 - 1800000000]) AS start_us
        |  FROM e
        |)
        |SELECT start_us, event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY start_us, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .select(unix_micros(col("w.start")).as("start_us"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("start_us", "event_type")
    },

    // Point-in-time (as-of) join: every click gets the value of the user's
    // most recent view at-or-before it — the temporal-join primitive
    // (feature-store lookup / market-data enrichment) Spark lacks as a
    // built-in, via AsOf.asofJoin's union-carry window (see its scaladoc).
    // DuckDB has native ASOF JOIN, so the oracle is exact: timestamps are
    // integer microseconds on both sides, views are pre-aggregated unique
    // per (user, ts) and non-null (the operator's caller contract), and
    // the value doubles pass through both engines untouched.
    QueryDef.of("events_asof",
      """WITH v AS (
        |  SELECT user_id, ts, max(value) AS view_value FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1, 2
        |), c AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'
        |)
        |SELECT c.event_id, epoch_us(c.ts) AS ts_us, c.user_id, c.value,
        |  v.view_value
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val views = ev
        .filter(col("event_type") === "view" && col("value").isNotNull)
        .groupBy("user_id", "ts").agg(max("value").as("view_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      graft.operators.AsOf.asofJoin(clicks, views, Seq("user_id"), "ts",
          Seq("view_value"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("value"),
          col("asof_view_value").as("view_value"))
        .orderBy("event_id")
    },

    // Interval (range) join: assign every event to its session's
    // [start, end] interval — via RangeJoin.binnedIntervalJoin, which turns
    // the range predicate into an equi-join on (user_id, time bin) instead
    // of the broadcast-nested-loop plan a raw BETWEEN join gets (see the
    // operator's scaladoc; bin width 30 min ≈ the session gap, so interval
    // replication stays small). Self-consistency built in: every event
    // lands in exactly ONE of its user's sessions (sessions are disjoint
    // and bounded by their min/max event times), so the output is one row
    // per event. Oracle: the same session CTE joined with BETWEEN.
    QueryDef.of("events_session_assign",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |), m AS (
        |  SELECT user_id, us, event_id,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT user_id, us, event_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM m
        |), iv AS (
        |  SELECT user_id, CAST(min(us) AS BIGINT) AS start_us,
        |    CAST(max(us) AS BIGINT) AS end_us
        |  FROM s GROUP BY user_id, sess_no
        |)
        |SELECT e.event_id, e.user_id, iv.start_us, iv.end_us
        |FROM e JOIN iv
        |  ON e.user_id = iv.user_id AND e.us BETWEEN iv.start_us AND iv.end_us
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val intervals = sessionized(s, dir)
        .groupBy("user_id", "sess_no")
        .agg(min("us").as("start_us"), max("us").as("end_us"))
        .drop("sess_no")
      val points = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      graft.operators.RangeJoin.binnedIntervalJoin(points, intervals,
          Seq("user_id"), "us", "start_us", "end_us", binWidth = 1800000000L)
        .select("event_id", "user_id", "start_us", "end_us")
        .orderBy("event_id")
    },

    // KMV distinct-count sketch, per nation, next to the exact count. The
    // sketch hashes with the engine-portable polynomial fingerprint, so
    // the whole ESTIMATE — k smallest distinct hashes → k-th minimum →
    // (k-1)·M/h_k in IEEE doubles — is a deterministic function of the
    // data that DuckDB replicates bit-for-bit (the portable-hash oracle
    // technique; no tolerance band needed for an "approximate" operator).
    // The aggregator ships ≤ k longs per partition per group (mergeable
    // sketch — the 100 TB distinct-count shape); per-nation cardinality
    // (~55-75) exceeds k=16, so the ESTIMATOR branch is what's certified,
    // not the exact fallback.
    QueryDef.of("distinct_sketch",
      """WITH h AS (
        |  SELECT c_nationkey,
        |    CASE WHEN length(trim(c_name)) = 0 THEN 0
        |    ELSE list_reduce(
        |      list_prepend(CAST(0 AS BIGINT), list_transform(
        |        string_split_regex(trim(c_name), '[ \t\n\x0B\f\r]+'),
        |        t -> list_reduce(
        |               list_prepend(CAST(17 AS BIGINT), list_transform(
        |                 generate_series(1, length(t)),
        |                 i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
        |               (a, c) -> (a * 31 + c) % 2147483647))),
        |      (a, th) -> (a * 1000003 + th) % 2147483647)
        |    END AS hv
        |  FROM customer WHERE c_name IS NOT NULL
        |), d AS (
        |  SELECT DISTINCT c_nationkey, hv FROM h
        |), r AS (
        |  SELECT c_nationkey, hv,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY c_nationkey) AS nd
        |  FROM d
        |), e AS (
        |  SELECT c_nationkey,
        |    CASE WHEN max(nd) < 16 THEN CAST(max(nd) AS DOUBLE)
        |         ELSE (15.0 * 2147483647.0)
        |              / CAST(max(CASE WHEN rn = 16 THEN hv END) AS DOUBLE)
        |    END AS est_distinct
        |  FROM r GROUP BY c_nationkey
        |), t AS (
        |  SELECT c_nationkey, CAST(count(DISTINCT c_name) AS BIGINT) AS true_distinct
        |  FROM customer WHERE c_name IS NOT NULL GROUP BY c_nationkey
        |)
        |SELECT e.c_nationkey, e.est_distinct, t.true_distinct
        |FROM e JOIN t USING (c_nationkey)
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions
      import graft.operators.Sketch
      Tables.customer(s, dir)
        .filter(col("c_name").isNotNull)
        .select(col("c_nationkey"), col("c_name"),
          TextFunctions.fingerprint(col("c_name")).as("hv"))
        .groupBy("c_nationkey")
        .agg(Sketch.kmvDistinct(16)(col("hv")).as("est_distinct"),
          countDistinct(col("c_name")).as("true_distinct"))
        .orderBy("c_nationkey")
    },

    // Bounded-sample quantile sketch, per returnflag: the k=256 smallest
    // rows by portable row-identity hash form a uniform-by-hash sample;
    // p50/p90/p99 are discrete quantiles of the sample (index via integer
    // floor division — no double rounding). DETERMINISTIC in the SAMPLING
    // branch (group sizes ≫ 256 at every SF), so the oracle recomputes the
    // same sample and the same estimates bit-for-bit — the KMV portable-
    // oracle technique applied to quantiles. The aggregator ships ≤ k
    // (hash, value) pairs per partition per group (mergeable sketch — the
    // 100 TB percentile shape; an exact per-group sort would shuffle the
    // whole table into per-key sorts).
    QueryDef.of("quantile_sketch",
      """WITH h AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    list_reduce(
        |      list_prepend(CAST(17 AS BIGINT), list_transform(
        |        generate_series(1, length(s)),
        |        i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 2147483647) AS hv
        |  FROM (SELECT l_returnflag, l_extendedprice,
        |          concat(l_orderkey, ':', l_linenumber) AS s FROM lineitem)
        |), d AS (
        |  SELECT DISTINCT flag, hv, v FROM h
        |), r AS (
        |  SELECT flag, hv, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY hv, v) AS rn
        |  FROM d
        |), sm AS (
        |  SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY v) AS vr,
        |    count(*) OVER (PARTITION BY flag) AS m
        |  FROM r WHERE rn <= 256
        |)
        |SELECT flag AS l_returnflag,
        |  CAST(max(m) AS INTEGER) AS n_sample,
        |  max(CASE WHEN vr = ((m - 1) * 1) // 2 + 1 THEN v END) AS p50,
        |  max(CASE WHEN vr = ((m - 1) * 9) // 10 + 1 THEN v END) AS p90,
        |  max(CASE WHEN vr = ((m - 1) * 99) // 100 + 1 THEN v END) AS p99
        |FROM sm GROUP BY flag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions
      import graft.operators.Sketch
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          TextFunctions.fingerprint(
            concat_ws(":", col("l_orderkey"), col("l_linenumber"))).as("hv"),
          col("l_extendedprice").as("v"))
        .groupBy("l_returnflag")
        .agg(Sketch.quantileSketch(256)(col("hv"), col("v")).as("q"))
        .select(col("l_returnflag"),
          col("q.n_sample").as("n_sample"),
          col("q.p50").as("p50"), col("q.p90").as("p90"), col("q.p99").as("p99"))
        .orderBy("l_returnflag")
    },

    // Windowed first-touch FUNNEL over the events stream — the
    // behavioral-analytics completion of the events family: users
    // progressing view → click → purchase, each step within 24 h of the
    // previous (unwindowed, every user converts on this corpus — the
    // window is what makes a funnel a funnel). Times compared as
    // µs-truncated integers on BOTH sides (Spark reads TIMESTAMP(NANOS)
    // µs-truncated; the oracle floors epoch_ns/1000), so window
    // arithmetic is exact integer math with no timestamp-precision
    // hazard. Scale shape in Funnel's scaladoc: per step filter → join
    // on user against a funnel-shrinking build side → partial-agg min.
    QueryDef.of("events_funnel",
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events
        |), s1 AS (
        |  SELECT user_id, min(tus) AS t FROM ev WHERE event_type = 'view'
        |  GROUP BY user_id
        |), s2 AS (
        |  SELECT ev.user_id, min(ev.tus) AS t
        |  FROM ev JOIN s1 ON ev.user_id = s1.user_id
        |  WHERE ev.event_type = 'click' AND ev.tus > s1.t
        |    AND ev.tus <= s1.t + 86400000000
        |  GROUP BY ev.user_id
        |), s3 AS (
        |  SELECT ev.user_id, min(ev.tus) AS t
        |  FROM ev JOIN s2 ON ev.user_id = s2.user_id
        |  WHERE ev.event_type = 'purchase' AND ev.tus > s2.t
        |    AND ev.tus <= s2.t + 86400000000
        |  GROUP BY ev.user_id
        |)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type, CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |  UNION ALL
        |  SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |  UNION ALL
        |  SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
        |) ORDER BY step""".stripMargin) { (s, dir) =>
      import graft.operators.Funnel
      Funnel.stepCounts(
          Tables.events(s, dir).withColumn("tus", unix_micros(col("ts"))),
          "user_id", "tus", "event_type",
          Seq("view", "click", "purchase"), windowUnits = 86400000000L)
        .orderBy("step")
    },

    // EXACT per-group percentiles — the sketch's exact sibling (the
    // heavy_hitters pattern applied to quantile_sketch). l_quantity has a
    // BOUNDED integer domain (1..50), so the exact distribution is a
    // (flag, value) histogram: partial-aggregated, at most
    // |flags| × |domain| rows leave the map side at ANY corpus size, and
    // the percentiles read off the cumulative histogram with the same
    // discrete nearest-rank definition the sketch uses
    // (rank = ((n−1)·num) DIV den + 1 over the sorted population, value =
    // first histogram bin whose cumulative count reaches the rank). The
    // per-flag window runs over the AGGREGATED histogram (≤ 50 rows per
    // flag), never the raw table — exact percentiles with no per-key sort
    // of the data, the 100 TB shape for bounded-domain columns; the
    // sketch remains the path for unbounded domains (l_extendedprice).
    // All-integer, so the oracle replays it exactly; SketchSpec certifies
    // the sketch's estimates against this in-engine exact point.
    QueryDef.of("quantile_exact",
      """WITH h AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), e AS (
        |  SELECT flag, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY v) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n
        |  FROM h
        |)
        |SELECT flag AS l_returnflag, max(n) AS n_rows,
        |  min(CASE WHEN cum >= ((n - 1) * 1) // 2 + 1 THEN v END) AS p50,
        |  min(CASE WHEN cum >= ((n - 1) * 9) // 10 + 1 THEN v END) AS p90,
        |  min(CASE WHEN cum >= ((n - 1) * 99) // 100 + 1 THEN v END) AS p99
        |FROM e GROUP BY flag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val hist = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("v"))
        .groupBy("flag", "v").agg(count(lit(1)).as("cnt"))
      val e = hist
        .withColumn("cum",
          sum("cnt").over(Window.partitionBy("flag").orderBy("v")))
        .withColumn("n", sum("cnt").over(Window.partitionBy("flag")))
      e.groupBy(col("flag").as("l_returnflag"))
        .agg(max("n").as("n_rows"),
          min(when(col("cum") >= expr("((n - 1) * 1) DIV 2 + 1"), col("v"))).as("p50"),
          min(when(col("cum") >= expr("((n - 1) * 9) DIV 10 + 1"), col("v"))).as("p90"),
          min(when(col("cum") >= expr("((n - 1) * 99) DIV 100 + 1"), col("v"))).as("p99"))
        .orderBy("l_returnflag")
    },

    // EXACT percentiles over an UNBOUNDED double domain — the third point
    // of the percentile triad (quantile_exact = bounded-domain histogram,
    // quantile_sketch = one-pass approximate): radix-descent distributed
    // SELECTION. Per level, one partial-agg histogram pass bucketing
    // l_extendedprice by a plan-time (lo, step) when-chain; the driver
    // walks ≤ fanout counts to the bucket holding each target rank and
    // recurses with step/fanout (EXACT power-of-two refinement — child
    // buckets partition parents bit-exactly, see Quantiles' scaladoc);
    // a final pass reads the rank off per-value counts inside the ≤
    // collectLimit-row bucket. No sort, no per-key shuffle of raw rows —
    // L = ceil(log_4096(n/100k)) histogram passes (= 1 at sf0.1, 2 at
    // 10^12 rows). The output doubles are STORED values untouched by
    // arithmetic, so the oracle's sort-based rank selection returns the
    // identical bits.
    QueryDef.of("quantile_radix",
      """WITH r AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |)
        |SELECT flag AS l_returnflag, CAST(max(n) AS BIGINT) AS n_rows,
        |  max(CASE WHEN rn = ((n - 1) * 1) // 2 + 1 THEN v END) AS p50,
        |  max(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN v END) AS p90,
        |  max(CASE WHEN rn = ((n - 1) * 99) // 100 + 1 THEN v END) AS p99
        |FROM r GROUP BY flag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import graft.operators.Quantiles
      Quantiles.exactPercentilesByRadix(
          Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag")
    },

    // Bloom-prefiltered semi join: lineitem rows whose part is size 5. The
    // dim keys aggregate into a 64 Kbit bitmap (one bounded job, 8 KB to
    // the driver), the fact scan probes it with a native codegen'd
    // predicate BEFORE the join — on a cluster the runtime-filter pattern
    // that keeps non-matching fact rows out of the shuffle entirely — and
    // an exact semi join closes the (~few %) false positives, so the
    // answer IS the plain semi join the oracle runs.
    QueryDef.of("bloom_semi_join",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 5)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import graft.operators.Bloom
      val dim = Tables.part(s, dir).filter(col("p_size") === 5)
      Bloom.semiJoin(Tables.lineitem(s, dir), "l_partkey", dim, "p_partkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // Time-series resample with gap filling: hourly event counts per type,
    // ZERO-filled over the full global hour grid (the dense-resample
    // primitive behind rate dashboards and anomaly baselines). The grid is
    // generated DISTRIBUTED — sequence() exploded from a 1-row bounds
    // aggregate, cross-joined with the distinct types (both tiny derived
    // frames, broadcast by Catalyst) — never a driver-side loop; observed
    // counts left-join onto it keyed (type, hour). Output is
    // types × hours regardless of event volume, so the plan's cost at
    // 100 TB is one partial-agg pass over events plus a bounded join.
    QueryDef.of("events_resample",
      """WITH b AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        |  FROM events
        |), g AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
        |), t AS (
        |  SELECT DISTINCT event_type FROM events
        |), o AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT t.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  COALESCE(o.c, CAST(0 AS BIGINT)) AS cnt
        |FROM t CROSS JOIN g
        |LEFT JOIN o ON o.event_type = t.event_type AND o.h = g.h
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val grid = ev
        .agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("h"))
      val types = ev.select("event_type").distinct()
      val observed = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"))
      types.crossJoin(grid)
        .join(observed, Seq("event_type", "h"), "left")
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          coalesce(col("c"), lit(0L)).as("cnt"))
        .orderBy("event_type", "hour_start")
    },

    // HOUR-OF-DAY SEASONALITY profile — the diurnal-shape view behind
    // rate baselining (events_anomaly's z-scores detect deviations; this
    // row exposes the periodic structure they deviate FROM): per
    // (event_type, hour-of-day 0-23) event count and its share of the
    // type's total. One partial-aggregated pass over events into a
    // ≤ types × 24 result; counts are exact integers, the share is ONE
    // division of two of them (types' totals ride along via a
    // sorted-safe second aggregation, not a window). UTC on both sides
    // (sessions pin UTC; DuckDB hour() on the naive µs timestamp reads
    // the same wall-clock field).
    QueryDef.of("events_seasonality",
      """WITH c AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1
        |)
        |SELECT c.event_type, c.hod, c.cnt,
        |  CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
        |FROM c JOIN t ON c.event_type = t.event_type
        |ORDER BY c.event_type, c.hod""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir)
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("cnt"))
      val t = c.groupBy("event_type").agg(sum("cnt").as("total"))
      c.join(t, "event_type")
        .select(col("event_type"), col("hod"), col("cnt"),
          (col("cnt").cast("double") / col("total").cast("double")).as("share"))
        .orderBy("event_type", "hod")
    },

    // FORWARD-FILL resample (last observation carried forward) — the
    // gap-fill sibling of events_resample's zero-fill: hourly per-type
    // counts and max values on the dense grid, with missing hours
    // carrying the LAST OBSERVED hourly aggregate (sensor/metric
    // semantics, where absence means "unchanged", not zero; hours before
    // a type's first observation stay NULL — nothing to carry). The
    // ffill window runs over the RESAMPLED GRID (types × hours — bounded
    // regardless of event volume), never over raw events, so the per-key
    // window here is a bounded-domain frame, not the data-sized per-key
    // sort the engine's no-per-key-window rule bans on candidate paths.
    // Counts are integers; max(value) is a raw double (no arithmetic) —
    // both hash-exact; IGNORE NULLS last_value over the same
    // ROWS-UNBOUNDED-PRECEDING frame on both sides.
    QueryDef.of("events_ffill",
      """WITH b AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        |  FROM events
        |), g AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
        |), t AS (
        |  SELECT DISTINCT event_type FROM events
        |), o AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(count(*) AS BIGINT) AS c, max(value) AS mx
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  last_value(c IGNORE NULLS) OVER w AS cnt_ffill,
        |  last_value(mx IGNORE NULLS) OVER w AS max_ffill
        |FROM (
        |  SELECT t.event_type, g.h, o.c, o.mx
        |  FROM t CROSS JOIN g
        |  LEFT JOIN o ON o.event_type = t.event_type AND o.h = g.h
        |)
        |WINDOW w AS (PARTITION BY event_type ORDER BY h
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, hour_start""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val grid = ev
        .agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("h"))
      val types = ev.select("event_type").distinct()
      val observed = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"), max("value").as("mx"))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      types.crossJoin(grid)
        .join(observed, Seq("event_type", "h"), "left")
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          last(col("c"), ignoreNulls = true).over(w).as("cnt_ffill"),
          last(col("mx"), ignoreNulls = true).over(w).as("max_ffill"))
        .orderBy("event_type", "hour_start")
    },

    // Pivot (wide aggregation): quantity sums per returnflag, one column
    // per linestatus. Pivot values are given EXPLICITLY — the implicit form
    // runs a driver-side distinct job to discover them, a plan-time
    // collect a 100 TB pipeline shouldn't pay. Sums of integral-valued
    // doubles are order-independent, so the hash check is stable.
    QueryDef.of("pivot_agg",
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    },

    // Blocked fuzzy match (entity resolution): near-identical part names at
    // edit distance <= 3, candidates generated ONLY within a block (the
    // name's last token) so the distance runs on an equi-joined vocabulary,
    // never a cartesian. Support counts ride along so resolution can pick
    // the frequent spelling. Both engines' levenshtein is the classic
    // integer edit distance — the oracle replays blocking + distance
    // exactly. Whitespace spelled as the explicit class (Java \s vs RE2 \s
    // diverge on U+000B).
    QueryDef.of("fuzzy_join",
      """WITH names AS (
        |  SELECT p_name, CAST(count(*) AS BIGINT) AS n,
        |    list_extract(string_split_regex(p_name, '[ \t\n\x0B\f\r]+'), -1) AS blk
        |  FROM part GROUP BY p_name
        |)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  a.n AS n_a, b.n AS n_b
        |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
      import graft.operators.Fuzzy
      Fuzzy.blockedLevenshteinPairs(Tables.part(s, dir), "p_name",
          name => element_at(split(name, "\\s+"), -1), maxDist = 3)
        .orderBy("name_a", "name_b")
    },

    // Time-RANGE window frame (the rows-frame `window_running`'s
    // event-time sibling): per-user trailing-1-hour event count and max
    // value at every event — the rate-limit / rolling-exposure primitive.
    // The frame is declared over integer MICROSECONDS on both sides
    // (Spark's rangeBetween and DuckDB's RANGE ... PRECEDING are both
    // closed intervals over the ORDER BY value), so frame membership is
    // exact integer arithmetic; the aggregates (count, max) are
    // order-insensitive, so ties inside a frame can't perturb the hash.
    // Scale: partitioned by user_id — no global window anywhere
    // (PlanSpec-pinned), one shuffle on the partition key.
    QueryDef.of("events_rolling",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
        |)
        |SELECT user_id, event_id, ts_us,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  max(value) OVER w AS max_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("max_1h", max("value").over(w))
        .select("user_id", "event_id", "ts_us", "n_1h", "max_1h")
        .orderBy("user_id", "ts_us", "event_id")
    },

    // Event-sequence transition matrix (first-order Markov estimate):
    // which event type follows which, per user, with the row-normalized
    // probability. Sequences ordered by (µs, event_id) — a unique total
    // order, so the pair multiset is deterministic. cnt and its from-type
    // total are exact integers; prob is ONE IEEE division of those two
    // integers, identical bit-for-bit in both engines (no sums of doubles
    // anywhere). The lead window partitions by user (bounded); the
    // normalizing totals frame is ≤ |types| rows — AQE broadcasts it.
    QueryDef.of("events_markov",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
        |), t AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS to_type
        |  FROM e
        |), c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_type, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1
        |)
        |SELECT c.from_type, c.to_type, c.cnt,
        |  CAST(c.cnt AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS prob
        |FROM c JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      graft.operators.Markov.transitions(
          Tables.events(s, dir).select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("event_type")),
          key = "user_id", time = "us", typ = "event_type",
          tieBreak = "event_id")
        .orderBy("from_type", "to_type")
    },

    // Cohort retention triangle: users grouped by first-activity week,
    // counted when active N weeks after their first day. Pure integer
    // floor division over µs (day = us div 86400e6, offset weeks =
    // days-since-first div 7) — nonneg everywhere, so Spark's `div`
    // (truncating) and DuckDB's `//` (flooring) agree exactly. The
    // distinct (user, day) collapse happens FIRST, so everything after is
    // sized by active-user-days, not events.
    QueryDef.of("events_retention",
      """WITH e AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
        |), c AS (
        |  SELECT user_id, min(d) AS cohort_d FROM e GROUP BY 1
        |)
        |SELECT CAST(cohort_d // 7 AS BIGINT) AS cohort_week,
        |  CAST((d - cohort_d) // 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      graft.operators.Cohort.retention(
          Tables.events(s, dir)
            .select(col("user_id"), unix_micros(col("ts")).as("us")),
          key = "user_id", time = "us",
          unitsPerBucket = 86400000000L, bucketsPerPeriod = 7)
        .select(col("cohort_period").as("cohort_week"),
          col("period_offset").as("week_offset"), col("n_active"))
        .orderBy("cohort_week", "week_offset")
    },

    // Market-basket co-occurrence: top part pairs appearing in the same
    // order (support counting, the A-Priori first pass). Distinct
    // (order, part) first; the self-join is equi on the order key with
    // per-order work C(k,2), k ≤ 7 in TPC-H — linear in orders. Top-100
    // under a TOTAL order (cnt desc, then both keys) plans as
    // TakeOrderedAndProject, no global sort.
    QueryDef.of("basket_pairs",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |)
        |SELECT a.pk AS item_a, b.pk AS item_b, CAST(count(*) AS BIGINT) AS cnt
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 ORDER BY cnt DESC, item_a, item_b
        |LIMIT 100""".stripMargin) { (s, dir) =>
      graft.operators.Basket.pairCounts(
          Tables.lineitem(s, dir), basket = "l_orderkey", item = "l_partkey")
        .orderBy(desc("cnt"), col("item_a"), col("item_b"))
        .limit(100)
    },

    // Frequent 3-ITEMSETS (Agrawal & Srikant A-priori) — the lattice
    // level above basket_pairs and the input to 2→3 association rules:
    // part triples sharing ≥ 2 orders. The engine climbs via downward
    // closure (frequent-item prune → frequent-(a,b)-prefix prune on the
    // per-basket pairs → (a,c)/(b,c) candidate semi-joins → support
    // count); the oracle counts the unpruned 3-way join directly — the
    // A-priori theorem (every sub-itemset of a frequent itemset is
    // frequent) says the prunes cannot change the answer, and the hash
    // match certifies exactly that. All integers.
    QueryDef.of("basket_triples",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |)
        |SELECT a.pk AS item_a, b.pk AS item_b, c.pk AS item_c,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |          JOIN li c ON a.ok = c.ok AND b.pk < c.pk
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY item_a, item_b, item_c""".stripMargin) { (s, dir) =>
      graft.operators.Basket.frequentTriples(Tables.lineitem(s, dir),
          basket = "l_orderkey", item = "l_partkey", minSupport = 2L)
        .orderBy("item_a", "item_b", "item_c")
    },

    // INCREMENTAL VIEW MAINTENANCE certified as an oracle row: the engine
    // maintains a per-part (count, qty) aggregate by merging a stored
    // base aggregate with a batch aggregate (Ivm.mergeAdditive — one
    // full-outer join on the key, cost ∝ |Δ| + touched keys, the base
    // NEVER rescanned); the oracle aggregates the whole table from
    // scratch. agg(base ∪ Δ) = agg(base) ⊕ agg(Δ) for distributive
    // aggregates is the materialized-view algebra — the hash match IS
    // that theorem, bit-for-bit (sums kept integral: l_quantity cast to
    // BIGINT, the repo's exact-sum rule).
    QueryDef.of("agg_incremental",
      """SELECT l_partkey AS part, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY part""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_partkey").as("part"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("long")).as("qty"))
      val baseAgg = aggOf(li.filter(pmod(col("l_orderkey"), lit(10)) =!= 0))
      val deltaAgg = aggOf(li.filter(pmod(col("l_orderkey"), lit(10)) === 0))
      graft.operators.Ivm.mergeAdditive(baseAgg, deltaAgg, "part",
          Seq("n_items", "qty"))
        .orderBy("part")
    },

    // Entity-resolution CLUSTERS: fuzzy_join's blocked edit-distance pairs
    // fed through the dedup tier's union-find (duplicateClusters — the
    // same pointer-jumping RDD loop that powers dedup_survivors), then
    // joined back to names: every name in the fuzzy graph with its
    // cluster-canonical spelling. Names map to stable integer node ids
    // via min(p_partkey) per name; the canonical name is the cluster's
    // min-id member (the union-find min-label invariant), so the whole
    // composition — blocking, distance, transitive closure, canonical
    // pick — replays exactly in the oracle's recursive CTE.
    QueryDef.of("fuzzy_clusters",
      """WITH names AS (
        |  SELECT p_name, min(p_partkey) AS nid,
        |    list_extract(string_split_regex(p_name, '[ \t\n\x0B\f\r]+'), -1) AS blk
        |  FROM part GROUP BY p_name
        |), pr AS (
        |  SELECT a.nid AS s, b.nid AS d FROM names a JOIN names b
        |    ON a.blk = b.blk AND a.p_name < b.p_name
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3
        |), edges AS (
        |  SELECT s, d FROM pr UNION ALL SELECT d, s FROM pr
        |), reach AS (
        |  WITH RECURSIVE r(src, node) AS (
        |    SELECT DISTINCT s, s FROM edges
        |    UNION
        |    SELECT r.src, e.d FROM r JOIN edges e ON r.node = e.s
        |  ) SELECT src, min(node) AS cluster FROM r GROUP BY src
        |)
        |SELECT n.p_name AS name, c.p_name AS canon
        |FROM reach JOIN names n ON reach.src = n.nid
        |           JOIN names c ON reach.cluster = c.nid
        |ORDER BY name""".stripMargin) { (s, dir) =>
      import graft.operators.{Fuzzy, Dedup}
      val part = Tables.part(s, dir)
      val ids = part.groupBy("p_name").agg(min("p_partkey").as("nid"))
      val pairs = Fuzzy.blockedLevenshteinPairs(part, "p_name",
          name => element_at(split(name, "\\s+"), -1), maxDist = 3)
        .join(ids.select(col("p_name").as("name_a"), col("nid").as("doc_a")),
          "name_a")
        .join(ids.select(col("p_name").as("name_b"), col("nid").as("doc_b")),
          "name_b")
        .select("doc_a", "doc_b")
      // loopParts pinned — the fuzzy graph is far under one 50k-pair
      // partition at every driver SF (see dedup_survivors' rationale)
      Dedup.duplicateClusters(pairs, loopParts = 1,
        localPairsCap = 500000L)
        .join(ids.select(col("nid").as("doc_id"), col("p_name").as("name")),
          "doc_id")
        .join(ids.select(col("nid").as("cluster"), col("p_name").as("canon")),
          "cluster")
        .select("name", "canon")
        .orderBy("name")
    },

    // Item–item Jaccard over basket sets — "bought together" similarity,
    // the memory-based collaborative-filtering score. cnt (intersection)
    // and the per-item basket counts are exact integers; jaccard is ONE
    // IEEE division (cnt / (n_a + n_b − cnt)) — identical bits in both
    // engines, so even the jaccard-DESC ordering agrees (ties broken by
    // the key pair → a total order → TakeOrderedAndProject).
    QueryDef.of("item_similarity",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), n AS (
        |  SELECT pk, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY pk
        |), p AS (
        |  SELECT a.pk AS item_a, b.pk AS item_b, CAST(count(*) AS BIGINT) AS cnt
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2
        |)
        |SELECT item_a, item_b, cnt,
        |  CAST(cnt AS DOUBLE) / CAST(na.n + nb.n - cnt AS DOUBLE) AS jaccard
        |FROM p JOIN n na ON p.item_a = na.pk JOIN n nb ON p.item_b = nb.pk
        |ORDER BY jaccard DESC, item_a, item_b
        |LIMIT 100""".stripMargin) { (s, dir) =>
      graft.operators.Basket.itemJaccard(
          Tables.lineitem(s, dir), basket = "l_orderkey", item = "l_partkey")
        .orderBy(desc("jaccard"), col("item_a"), col("item_b"))
        .limit(100)
    },

    // Exact triangle census of the part co-occurrence graph (edges =
    // part pairs sharing ≥ 2 orders): node/edge/wedge/triangle counts +
    // the global clustering coefficient. The engine counts via DEGREE
    // ORIENTATION (O(m^1.5) regardless of skew — the 100 TB-safe form);
    // the oracle counts the a<b<c canonical way — every output is an
    // exact integer except the one 3T/W division, so the two algorithms
    // must (and do) agree bit-for-bit.
    QueryDef.of("graph_triangles",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS (
        |  SELECT a.pk AS a, b.pk AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), deg AS (
        |  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
        |    (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e) GROUP BY n
        |), ns AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg
        |), es AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        |ts AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  CASE WHEN n_wedges = 0 THEN NULL
        |       ELSE CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
        |  END AS clustering
        |FROM ns, es, ts ORDER BY n_nodes""".stripMargin) { (s, dir) =>
      val edges = graft.operators.Basket.pairCounts(
          Tables.lineitem(s, dir), basket = "l_orderkey", item = "l_partkey")
        .filter(col("cnt") >= 2)
        .select(col("item_a").as("src"), col("item_b").as("dst"))
      graft.operators.Graph.triangleStats(edges)
        .orderBy("n_nodes")
    },

    // Top user journeys: each user's first-5 event-type sequence, counted
    // across users. Ranks pivot into fixed columns (each rank matches
    // exactly ONE row under the unique (µs, event_id) order) and
    // concat_ws skips the NULL tail of short journeys identically in
    // both engines — no collect_list, no HOF, all codegen'd.
    QueryDef.of("session_paths",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events
        |), r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
        |  FROM e
        |), p AS (
        |  SELECT user_id,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS t1,
        |    max(CASE WHEN rn = 2 THEN event_type END) AS t2,
        |    max(CASE WHEN rn = 3 THEN event_type END) AS t3,
        |    max(CASE WHEN rn = 4 THEN event_type END) AS t4,
        |    max(CASE WHEN rn = 5 THEN event_type END) AS t5
        |  FROM r WHERE rn <= 5 GROUP BY user_id
        |)
        |SELECT concat_ws('>', t1, t2, t3, t4, t5) AS path,
        |  CAST(count(*) AS BIGINT) AS n_keys
        |FROM p GROUP BY path
        |ORDER BY n_keys DESC, path LIMIT 20""".stripMargin) { (s, dir) =>
      graft.operators.Paths.topPaths(
          Tables.events(s, dir).select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("event_type")),
          key = "user_id", time = "us", tieBreak = "event_id",
          typ = "event_type", len = 5)
        .orderBy(desc("n_keys"), col("path"))
        .limit(20)
    },

    // Customer RFM (recency / frequency / monetary) from orders. Recency
    // (max order µs) and frequency are exact integers; the monetary sum
    // of o_totalprice doubles runs as a SORTED FOLD over each customer's
    // amount list (the lm_surprisal determinism pattern), replayed
    // value-for-value by DuckDB's list_sort + list_reduce — a plain
    // SUM would be partition-order nondeterministic.
    QueryDef.of("rfm_scores",
      """WITH o AS (
        |  SELECT o_custkey AS k, epoch_us(o_orderdate) AS t, o_totalprice AS amt
        |  FROM orders
        |), g AS (
        |  SELECT k, max(t) AS recency_us, CAST(count(*) AS BIGINT) AS frequency,
        |    list_sort(list(amt)) AS amts
        |  FROM o GROUP BY k
        |)
        |SELECT k AS c_custkey, recency_us, frequency,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), amts),
        |    (a, x) -> a + x) AS monetary
        |FROM g ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      graft.operators.Rfm.scores(
          Tables.orders(s, dir).select(col("o_custkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
            col("o_totalprice")),
          key = "o_custkey", time = "t_us", amount = "o_totalprice")
        .select(col("k").as("c_custkey"), col("recency").as("recency_us"),
          col("frequency"), col("monetary"))
        .orderBy("c_custkey")
    },

    // Hourly-count anomaly detection per event type: population z-score
    // of each (type, hour) count within its type's series, top-20 by
    // |z|. The z is the INTEGER-LIFTED (n·x − Σx)/√(n·Σx² − (Σx)²) —
    // exact BIGINT moments, ONE division + ONE sqrt, the discriminant
    // exactly ≥ 0 by Cauchy–Schwarz — so both engines produce identical
    // bits and even the |z|-DESC ordering agrees.
    QueryDef.of("events_anomaly",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
        |), c AS (
        |  SELECT event_type, h, CAST(count(*) AS BIGINT) AS cnt
        |  FROM e GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cnt) AS BIGINT) AS sx,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS sxx
        |  FROM c GROUP BY 1
        |)
        |SELECT c.event_type, c.h AS hour, c.cnt,
        |  CAST(m.n * c.cnt - m.sx AS DOUBLE) /
        |    sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) AS z
        |FROM c JOIN m USING (event_type)
        |WHERE m.n * m.sxx - m.sx * m.sx <> 0
        |ORDER BY abs(z) DESC, event_type, hour LIMIT 20""".stripMargin) { (s, dir) =>
      val counts = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hour"))
        .groupBy("event_type", "hour").agg(count(lit(1)).as("cnt"))
      graft.operators.Timeseries.zscoreAnomalies(counts,
          key = "event_type", time = "hour", value = "cnt")
        .filter(col("z").isNotNull)
        .select(col("k").as("event_type"), col("t").as("hour"),
          col("x").as("cnt"), col("z"))
        .orderBy(abs(col("z")).desc, col("event_type"), col("hour"))
        .limit(20)
    },

    // Exponentially-smoothed hourly rate per event type (EWMA, α = 0.5):
    // the recurrence is inherently sequential, so it runs as a SORTED
    // FOLD over each type's hour series seeded with the first value —
    // DuckDB's seedless list_reduce replays it step-for-step (its
    // implicit seed IS the first element, mirrored by folding the tail).
    QueryDef.of("events_ewma",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
        |), c AS (
        |  SELECT event_type, h, CAST(count(*) AS BIGINT) AS x
        |  FROM e GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
        |    list_transform(
        |      list_sort(list(struct_pack(t := h, x := CAST(x AS DOUBLE)))),
        |      s -> s.x) AS xs
        |  FROM c GROUP BY event_type
        |)
        |SELECT event_type, n_points,
        |  list_reduce(xs, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma
        |FROM g ORDER BY event_type""".stripMargin) { (s, dir) =>
      val counts = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hour"))
        .groupBy("event_type", "hour").agg(count(lit(1)).as("cnt"))
      graft.operators.Timeseries.ewma(counts,
          key = "event_type", time = "hour", value = "cnt", alpha = 0.5)
        .select(col("k").as("event_type"), col("n_points"), col("ewma"))
        .orderBy("event_type")
    },

    // Per-brand Pearson correlation of order quantity vs part size — the
    // grouped-statistics row. Both variables are integer-valued, so all
    // five moments are exact BIGINTs and r is the INTEGER-LIFTED
    // (n·Σxy − Σx·Σy)/(√(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²)) — one division
    // over a product of two exact-integer sqrts, no cancellation hazard,
    // identical bits in both engines. The part dim joins broadcast.
    QueryDef.of("corr_brand",
      """WITH j AS (
        |  SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS x,
        |    CAST(p.p_size AS BIGINT) AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |), m AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM j GROUP BY 1
        |)
        |SELECT p_brand, n AS n_rows,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
        |       ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
        |            (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |             sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |  END AS r
        |FROM m ORDER BY p_brand""".stripMargin) { (s, dir) =>
      graft.operators.Stats.pearsonByGroup(
          Tables.lineitem(s, dir)
            .join(Tables.part(s, dir),
              col("l_partkey") === col("p_partkey"))
            .select(col("p_brand"), col("l_quantity"), col("p_size")),
          group = "p_brand", x = "l_quantity", y = "p_size")
        .select(col("g").as("p_brand"), col("n_rows"), col("r"))
        .orderBy("p_brand")
    },

    // Quantile feature binning — ntile WITHOUT a data-sized window: exact
    // per-group quartile boundaries come off the bounded (group, value)
    // histogram (the quantile_exact rank rule), broadcast back, and each
    // row buckets by three integer comparisons — at 100 TB the raw table
    // is scanned twice (histogram + assignment) and never sorted, where
    // ntile(4) OVER (ORDER BY v) is a single-task global sort. Counts per
    // (priority, quartile) are exact BIGINTs; boundary semantics: bucket
    // b = 1 + Σ (v > q_b), so ties sit in the lowest eligible bucket in
    // both engines.
    QueryDef.of("feature_bins",
      """WITH h AS (
        |  SELECT o_orderpriority AS g, CAST(floor(o_totalprice) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2
        |), e AS (
        |  SELECT g, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM h
        |), q AS (
        |  SELECT g,
        |    min(CASE WHEN cum >= ((n - 1) * 1) // 4 + 1 THEN v END) AS q25,
        |    min(CASE WHEN cum >= ((n - 1) * 2) // 4 + 1 THEN v END) AS q50,
        |    min(CASE WHEN cum >= ((n - 1) * 3) // 4 + 1 THEN v END) AS q75
        |  FROM e GROUP BY g
        |)
        |SELECT o.o_orderpriority,
        |  1 + (CASE WHEN CAST(floor(o.o_totalprice) AS BIGINT) > q.q25 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(floor(o.o_totalprice) AS BIGINT) > q.q50 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(floor(o.o_totalprice) AS BIGINT) > q.q75 THEN 1 ELSE 0 END)
        |    AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o JOIN q ON o.o_orderpriority = q.g
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"),
          floor(col("o_totalprice")).as("v"))
      val hist = orders.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      val e = hist
        .withColumn("cum",
          sum("cnt").over(Window.partitionBy("g").orderBy("v")))
        .withColumn("n", sum("cnt").over(Window.partitionBy("g")))
      val q = e.groupBy("g").agg(
        min(when(col("cum") >= expr("((n - 1) * 1) DIV 4 + 1"), col("v"))).as("q25"),
        min(when(col("cum") >= expr("((n - 1) * 2) DIV 4 + 1"), col("v"))).as("q50"),
        min(when(col("cum") >= expr("((n - 1) * 3) DIV 4 + 1"), col("v"))).as("q75"))
      orders.join(broadcast(q), "g")
        .select(col("g").as("o_orderpriority"),
          (lit(1)
            + when(col("v") > col("q25"), 1).otherwise(0)
            + when(col("v") > col("q50"), 1).otherwise(0)
            + when(col("v") > col("q75"), 1).otherwise(0)).as("bucket"),
          col("v"))
        .groupBy("o_orderpriority", "bucket")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority", "bucket")
    },

    // Robust per-type location/scale/outlier summary of the events value
    // stream: lower median, MAD, and the |v − med| > 3·MAD outlier count
    // — the robust sibling of events_anomaly's mean/stddev z-score
    // (~11% of events sit in the heavy tail the robust rule flags and a
    // stddev absorbs). EVERY output is a BIGINT (floored values,
    // rank-selected medians, integer comparisons) — no floating point to
    // mirror; the windows run over the bounded per-(type, value)
    // histogram, never the raw stream.
    QueryDef.of("robust_stats",
      """WITH h AS (
        |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2
        |), e AS (
        |  SELECT event_type, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM h
        |), med AS (
        |  SELECT event_type, max(n) AS n_rows,
        |    min(CASE WHEN cum >= (n - 1) // 2 + 1 THEN v END) AS median
        |  FROM e GROUP BY event_type
        |), dev AS (
        |  SELECT h.event_type, abs(h.v - m.median) AS v,
        |    CAST(sum(h.cnt) AS BIGINT) AS cnt
        |  FROM h JOIN med m ON h.event_type = m.event_type GROUP BY 1, 2
        |), e2 AS (
        |  SELECT event_type, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM dev
        |), mad AS (
        |  SELECT event_type,
        |    min(CASE WHEN cum >= (n - 1) // 2 + 1 THEN v END) AS mad
        |  FROM e2 GROUP BY event_type
        |), outl AS (
        |  SELECT h.event_type,
        |    CAST(sum(CASE WHEN abs(h.v - m.median) > 3 * d.mad
        |      THEN h.cnt ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM h JOIN med m ON h.event_type = m.event_type
        |         JOIN mad d ON h.event_type = d.event_type
        |  GROUP BY h.event_type
        |)
        |SELECT m.event_type, m.n_rows, m.median, d.mad, o.n_outliers
        |FROM med m JOIN mad d ON m.event_type = d.event_type
        |           JOIN outl o ON m.event_type = o.event_type
        |ORDER BY m.event_type""".stripMargin) { (s, dir) =>
      graft.operators.Stats.robustStatsByGroup(
          Tables.events(s, dir)
            .select(col("event_type"), floor(col("value")).as("vf")),
          group = "event_type", value = "vf", k = 3)
        .select(col("g").as("event_type"), col("n_rows"), col("median"),
          col("mad"), col("n_outliers"))
        .orderBy("event_type")
    },

    // PageRank over the item co-purchase graph (5 power-iteration steps,
    // damping 0.85): which parts sit centrally in the "bought together"
    // network — the graph-centrality view next to graph_triangles' local
    // structure and basket_pairs' raw co-occurrence. The symmetrized
    // distinct edge set guarantees no dangling nodes; degrees/N are
    // integers, every per-node incoming sum is a sorted fold, and the
    // oracle unrolls the 5 steps as a CTE chain (the bpe_merges
    // technique) replaying each fold with list_sort + list_reduce.
    QueryDef.of("graph_pagerank", pageRankOracle(5)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      graft.operators.Graph.pageRank(e, iterations = 5)
        .orderBy("node")
    },

    // WEIGHTED PageRank on the co-purchase graph: rank distributed over
    // out-edges proportionally to SHARED-ORDER COUNT (the basket
    // strength sssp already uses as distance) — centrality that follows
    // traffic mass, not mere adjacency. Contribution (pr·w)/sw with
    // integer weights; the oracle replays the same two-level fold with
    // the weighted element. With w ≡ 1 this operator IS graph_pagerank
    // bit-for-bit (GraphSpec pins the law).
    QueryDef.of("graph_pagerank_weighted",
      pageRankWeightedOracle(5)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      graft.operators.Graph.pageRankWeighted(e, iterations = 5)
        .orderBy("node")
    },

    // PERSONALIZED PageRank on the same co-purchase graph (Haveliwala
    // 2002): teleport mass pinned to the 4 smallest part ids — "what
    // else does this seed neighborhood buy", the related-item retrieval
    // view next to graph_pagerank's global centrality. Seeds are plan
    // constants (4-row bounded collect, the bfsFromMinSource pattern);
    // everything else is pageRank's hub-safe machinery verbatim, and the
    // oracle is the same two-level-fold CTE chain with the jump term as
    // a seed-membership CASE.
    QueryDef.of("graph_ppr", pprOracle(5, 4)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      // seeds = the 4 smallest src nodes, collected INSIDE the operator
      // off its checkpointed edge leaf (r15): the explicit-seed wiring
      // paid the whole co-purchase derivation twice — once for the seed
      // collect, once inside the operator. Same seeds, same rows.
      graft.operators.Graph.personalizedPageRankMinSeeds(e, nSeeds = 4,
          iterations = 5)
        .orderBy("node")
    },

    // Label-propagation communities over the same co-purchase graph
    // (4 synchronous rounds, Raghavan et al.): which parts cluster into
    // "bought-together" neighborhoods — the community view next to
    // graph_pagerank's centrality and graph_triangles' local structure.
    // Deterministic BY CONSTRUCTION (most-frequent in-neighbor label,
    // ties to the smallest — classic async LPA is run-order dependent
    // and no oracle could replay it); all-integer, so the CTE-chain
    // oracle replays every round exactly.
    QueryDef.of("graph_lpa", lpaOracle(4)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      graft.operators.Graph.labelPropagation(e, iterations = 4)
        .orderBy("node")
    },

    // k-bounded BFS from the smallest part in the co-purchase graph: hop
    // distance to everything reachable in ≤ 3 steps — the reachability /
    // ego-network view next to graph_pagerank's centrality and graph_lpa's
    // communities. Level-synchronous frontier expansion (distinct
    // successors minus the anti-joined visited set, each level a
    // checkpoint-tracked leaf); all integers, so the oracle unrolls the
    // three levels as a CTE chain and must (and does) agree exactly. The
    // 1-long source min (pageRank's bounded-collect class) runs over the
    // ALREADY-checkpointed base — bfsFromMinSource — so the co-purchase
    // derivation is paid once, not twice.
    QueryDef.of("graph_bfs", bfsOracle(3)) { (s, dir) =>
      // NOT liPairs-checkpointed: materializing the 600k-row incidence
      // frame costs more than the second scan+distinct it saves
      // (measured 7.8 → 11.1 s, r15 experiment A) — the self-join's
      // duplicated derivation is the cheaper evil at this shape
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      graft.operators.Graph.bfsFromMinSource(e, maxDepth = 3)
        .orderBy("node")
    },

    // k-bounded single-source shortest paths (4 Bellman–Ford rounds)
    // over the WEIGHTED co-purchase graph: edge cost 11 − min(shared
    // orders, 10), so strongly co-purchased parts are "close" — the
    // distance completion of graph_bfs's hop reachability (bfs: how many
    // hops; sssp: how cheap). All-integer min-plus recurrence, so the
    // CTE-chain oracle replays every relaxation round exactly; the
    // source is the graph's smallest part id (the graph_bfs convention),
    // picked off the already-checkpointed weighted base.
    QueryDef.of("graph_sssp", ssspOracle(4)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst")
        .agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"),
          (lit(11L) - least(col("cnt"), lit(10L))).as("w"))
      graft.operators.Graph.ssspFromMinSource(e, maxRounds = 4)
        .orderBy("node")
    },

    // k-CORE PEELING (Seidman cores) over the SPARSE co-purchase graph
    // (parts sharing ≥ 2 orders — see strongCoPurchaseCte): 4 synchronous
    // rounds of "recompute in-subgraph degree, drop everything under
    // k=2" — the density-curation primitive (keep the subgraph where
    // every node has ≥ k supported neighbors; the spam/fringe filter
    // before expensive per-node work). Real peeling at every SF
    // (sf0.01: 1880 → 1535 nodes; sf0.1: 5922 → 7 — the threshold graph
    // is mostly trees and small cycles there, and the peel proves it).
    // All integers → the CTE chain replays the rounds bit-for-bit.
    QueryDef.of("graph_kcore", kCoreOracle(2, 4)) { (s, dir) =>
      val e = strongCoPurchaseEdges(s, dir)
      graft.operators.Graph.kCore(e, k = 2, rounds = 4)
        .orderBy("node")
    },

    // CONNECTED COMPONENTS over the same sparse co-purchase graph — the
    // graph-toolkit face of the dedup tier's union-find (the SAME
    // pointer-jumping min-label RDD loop behind dedup_survivors /
    // fuzzy_clusters, now exposed on arbitrary edges): (node, component
    // = min member id). 2350 components at sf0.1 — the support
    // threshold genuinely fragments the graph. The oracle's recursive
    // CTE computes min-reachable-id, the same unique fixpoint.
    QueryDef.of("graph_components", componentsOracle) { (s, dir) =>
      val pr = strongCoPurchasePairs(s, dir)
      // loopParts pinned: a few-thousand-pair graph at every driver SF
      // (the fuzzy_clusters/dedup_survivors convention)
      graft.operators.Graph.connectedComponents(pr, src = "s", dst = "d",
          loopParts = 1, localPairsCap = 500000L)
        .orderBy("node")
    },

    // COMMON-NEIGHBOR LINK PREDICTION on the strong co-purchase graph:
    // top-50 distance-2 non-edges ranked by neighborhood Jaccard (cn and
    // degrees exact integers; jaccard ONE IEEE division — the
    // item_similarity determinism argument; (jaccard DESC, a, b) a total
    // order). Wedge cost Σ C(deg,2) partial-aggregated per pair — the
    // triangle census's bound; see Graph.linkPrediction for the hub-cap
    // guidance this hub-free graph doesn't need.
    QueryDef.of("graph_linkpred",
      strongCoPurchaseCte +
        """, deg AS (
          |  SELECT src AS n, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
          |), cn AS (
          |  SELECT l.dst AS a, r.dst AS b, CAST(count(*) AS BIGINT) AS cn
          |  FROM e l JOIN e r ON l.src = r.src AND l.dst < r.dst
          |  GROUP BY 1, 2
          |), cand AS (
          |  SELECT cn.a, cn.b, cn.cn FROM cn
          |  WHERE NOT EXISTS (SELECT 1 FROM pr WHERE pr.s = cn.a AND pr.d = cn.b)
          |)
          |SELECT c.a AS item_a, c.b AS item_b, c.cn,
          |  da.deg AS deg_a, db.deg AS deg_b,
          |  CAST(c.cn AS DOUBLE) / CAST(da.deg + db.deg - c.cn AS DOUBLE) AS jaccard
          |FROM cand c JOIN deg da ON c.a = da.n JOIN deg db ON c.b = db.n
          |ORDER BY jaccard DESC, item_a, item_b LIMIT 50""".stripMargin) { (s, dir) =>
      graft.operators.Graph.linkPrediction(
        strongCoPurchasePairs(s, dir), topK = 50, src = "s", dst = "d")
    },

    // K-TRUSS PEELING TRAJECTORY (Cohen 2008) on the strong co-purchase
    // graph, k = 4: every synchronous round deletes edges in < 2
    // triangles of the CURRENT subgraph; one (round, n_edges) row per
    // round certifies the whole cascade. rounds = 6 is the MEASURED
    // fixpoint + margin (sf0.001 peels 2324 -> 1966 over 5 real rounds;
    // sf0.01/sf0.1 empty by rounds 2-3 — the trajectory row stays
    // meaningful where the truss itself is empty). All-integer; the
    // oracle unrolls the canonical a<b<c triangle join per round.
    QueryDef.of("graph_ktruss", kTrussOracle(4, 6)) { (s, dir) =>
      graft.operators.Graph.kTrussTrajectory(
          strongCoPurchasePairs(s, dir), k = 4, rounds = 6,
          src = "s", dst = "d")
        .orderBy("round")
    },

    // ADAMIC-ADAR LINK PREDICTION — graph_linkpred's hub-discounted face:
    // each common neighbor m votes 1/ln(deg m) (ieee_ln, so the oracle's
    // libm ln sees the same bits), folded in middle-node order per
    // candidate pair. A wedge middle always has deg >= 2 -> ln > 0.
    QueryDef.of("graph_linkpred_aa",
      strongCoPurchaseCte +
        """, deg AS (
          |  SELECT src AS n, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
          |), w AS (
          |  SELECT l.dst AS a, r.dst AS b, l.src AS m, deg.deg AS dm
          |  FROM e l JOIN e r ON l.src = r.src AND l.dst < r.dst
          |  JOIN deg ON l.src = deg.n
          |), s AS (
          |  SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list_transform(list_sort(list(struct_pack(m := m, dm := dm))),
          |        x -> CAST(1.0 AS DOUBLE) / ln(CAST(x.dm AS DOUBLE)))),
          |      (acc, v) -> acc + v) AS aa
          |  FROM w GROUP BY a, b
          |)
          |SELECT a AS item_a, b AS item_b, cn, aa FROM s
          |WHERE NOT EXISTS (SELECT 1 FROM pr WHERE pr.s = s.a AND pr.d = s.b)
          |ORDER BY aa DESC, item_a, item_b LIMIT 50""".stripMargin) { (s, dir) =>
      graft.operators.Graph.linkPredictionAdamicAdar(
        strongCoPurchasePairs(s, dir), topK = 50, src = "s", dst = "d")
    },

    // HITS hubs & authorities (Kleinberg) on the BIPARTITE
    // customer→part purchase graph (part ids offset by 1e9 into their
    // own range — the two sides must not collide): hubs = customers
    // whose baskets concentrate on authoritative parts, authorities =
    // parts bought by hub customers — the mutual-reinforcement ranking
    // next to pageRank's random-walk one. 4 synchronous rounds,
    // max-rescaled per half-step (order-independent, unlike an L2 sum —
    // the choice that makes the round-by-round replay possible);
    // contribution sums through the shared hub-safe two-level fold.
    QueryDef.of("graph_hits", hitsOracle(4)) { (s, dir) =>
      val e = Tables.orders(s, dir)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("src"))
        .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"),
            (col("l_partkey") + lit(1000000000L)).as("dst")), "ok")
        .select("src", "dst")
      graft.operators.Graph.hits(e, iterations = 4)
        .orderBy("node")
    },

    // MAXIMAL INDEPENDENT SET (deterministic Luby) on the sparse
    // co-purchase graph — the DIVERSITY-SAMPLING primitive: a maximal
    // set of parts no two of which are strongly co-purchased ("pick a
    // covering subset with no two near neighbors", the subset selection
    // a curation pipeline runs after near-dup detection). 5 synchronous
    // rounds = a measured FIXPOINT + 1 idempotent margin (sf0.001 and
    // sf0.01 decide every node by round 4, sf0.1 by round 3; GraphSpec
    // pins round 5 as a no-op), so the output is the true MIS: 32/806/
    // 3087 members at sf0.001/0.01/0.1. All-integer statuses, the
    // MINSTD priority exact in both engines — the CTE chain replays
    // every round bit-for-bit.
    QueryDef.of("graph_mis", misOracle(5)) { (s, dir) =>
      val e = strongCoPurchaseEdges(s, dir)
      graft.operators.Graph.maximalIndependentSet(e, rounds = 5)
        .orderBy("node")
    },

    // k-HOP HARMONIC CENTRALITY (the disconnected-graph-safe closeness)
    // of the 4 smallest nodes on the sparse co-purchase graph: one
    // multi-source BFS keyed by (seed, node) — the |E| join per round is
    // shared across all seeds — then the per-(seed, dist) integer census
    // and the ≤6-term cnt/dist fold in dist order (fold state is
    // depth-bounded, never |V|). Distances/counts all integer; the
    // divisions are mirrored op-for-op; depth 6 is the row's SEMANTIC
    // (k-hop harmonic — what production centrality sweeps run), not a
    // fixpoint claim.
    QueryDef.of("graph_closeness", closenessOracle(6, 4)) { (s, dir) =>
      // seeds = the 4 smallest src nodes, collected inside the operator
      // off its checkpointed leaf (the graph_ppr r15 rationale — the
      // explicit wiring derived the strong co-purchase graph twice)
      graft.operators.Graph.harmonicCentralityMinSeeds(
          strongCoPurchaseEdges(s, dir), nSeeds = 4, maxDepth = 6)
        .orderBy("seed")
    },

    // TWO-SWEEP DIAMETER LOWER BOUND (double BFS) on the sparse
    // co-purchase graph: BFS from the min source, BFS again from its
    // farthest node — ecc(w) ≥ ecc(u) always, and the second sweep
    // typically lands the true diameter. maxDepth = 16 covers the
    // MEASURED eccentricities (3/13/1 at the three SFs) with margin.
    // All integer; one 1-row bounded driver collect between sweeps.
    // Measured lb: 3/13/1 at sf0.001/0.01/0.1 (the sf0.1 strong graph's
    // min-source component is a 2-clique — the 2350-component
    // fragmentation graph_components documents).
    QueryDef.of("graph_diameter_lb", diameterLbOracle(16)) { (s, dir) =>
      graft.operators.Graph.diameterLowerBound(
        strongCoPurchaseEdges(s, dir), maxDepth = 16)
    },

    // SEED-PAIR STRESS CENTRALITY (Shimbel) on the sparse co-purchase
    // graph: shortest-path counts through each node between the 4
    // smallest seeds — betweenness's integer-valued ancestor, carrying
    // the exact Brandes σ machinery (multi-source BFS with per-round
    // predecessor-σ sums) while staying fully oracle-replayable (exact
    // betweenness's dependency accumulation is an order-sensitive
    // double sum; the stress form never leaves BIGINT, and seed-pair
    // restriction is the standard sampling for a graph where full
    // betweenness is APSP). Depth 6 = the BFS cap semantic shared with
    // graph_closeness.
    QueryDef.of("graph_stress", stressOracle(6, 4)) { (s, dir) =>
      // min-seeds-inside-the-operator (the graph_closeness r15 rationale)
      graft.operators.Graph.stressCentralityMinSeeds(
          strongCoPurchaseEdges(s, dir), nSeeds = 4, maxDepth = 6)
        .orderBy("node")
    },

    // MINIMUM SPANNING FOREST (synchronous Borůvka) over the WEIGHTED
    // strong co-purchase graph (the graph_sssp weights on the
    // graph_components edge set): per round every component selects its
    // cheapest outgoing edge under the total order (w, a, b) and the
    // selections contract via the pointer-jumping union-find — THE
    // distributed MST shape (GHS / MST-in-MapReduce). rounds = 6 is the
    // MEASURED fixpoint + margin (sf0.001 finishes in 3 rounds, sf0.01
    // in 5, sf0.1 in 2 — forest sizes 199/1871/3572 = |V| − #components
    // at each SF, the spanning certificate). All-integer — the oracle
    // unrolls the rounds with nested recursive contraction CTEs and
    // replays the trajectory bit-for-bit; output is (round, a, b, w),
    // the round tag making the per-round census auditable (the kTruss
    // idiom).
    QueryDef.of("graph_mst", mstOracle(6)) { (s, dir) =>
      graft.operators.Graph.boruvkaMst(
          strongCoPurchaseWeightedPairs(s, dir), rounds = 6, loopParts = 1,
          localMergeCap = 500000L)
        .orderBy("a", "b")
    },

    // MST MAINTENANCE under an edge Δ-batch — the fourth graph-IVM face
    // (components: quotient contraction; degrees: additive merge;
    // triangles: Δ-anchored closure; MST: SPARSIFICATION):
    // MSF(G ∪ Δ) = MSF(MSF(G) ∪ Δ) — the classic sparsification
    // theorem, EXACT here because the (w, a, b) total order makes the
    // MSF unique (an edge outside MSF(G) is the strict max on a cycle
    // of G, stays so in G ∪ Δ, and the cycle property evicts it). The
    // engine re-runs Borůvka on the |V|-bounded stored forest plus the
    // batch — the base EDGE SET (the thing that grew) is never
    // rescanned; the oracle recomputes the whole graph's MSF from
    // scratch, so the hash match IS the theorem (the
    // graph_components_ivm pattern). Round tags are dropped: the
    // incremental rounds differ from the from-scratch ones; the edge
    // SET is the invariant.
    // rounds = 12 on BOTH internal runs: Borůvka round count is not
    // monotone under edge deletion, so the base subgraph and forest ∪ Δ
    // runs cannot inherit the FULL graph's measured fixpoint — and with
    // the empty-selection early exit each run stops one round past ITS
    // OWN fixpoint anyway, so 12 is a pure safety cap (covers 2¹²-deep
    // merge chains) costing nothing (GraphSpec pins the split-graph
    // fixpoints at sf0.001).
    QueryDef.of("graph_mst_ivm", mstIvmOracle(6)) { (s, dir) =>
      // ONE materialization of the weighted pair set (r15): base and Δ
      // are filters of the same derivation, and each Borůvka run
      // checkpoints its own input — uncheckpointed, the lineitem
      // self-join + groupBy ran once per referencing subtree (twice)
      val pw = graft.operators.Caches.checkpointTracked(
        strongCoPurchaseWeightedPairs(s, dir))
      val base = pw.filter(pmod(col("a") + col("b"), lit(5)) =!= 0)
      val delta = pw.filter(pmod(col("a") + col("b"), lit(5)) === 0)
      val baseMst = graft.operators.Graph.boruvkaMst(base, rounds = 12,
          loopParts = 1, localMergeCap = 500000L)
        .select("a", "b", "w")
      graft.operators.Graph.boruvkaMst(baseMst.unionAll(delta), rounds = 12,
          loopParts = 1, localMergeCap = 500000L)
        .select("a", "b", "w")
        .orderBy("a", "b")
    },

    // TRIANGLE-COUNT MAINTENANCE under an edge Δ-batch — the third
    // graph-IVM face (components: quotient contraction; degrees:
    // additive merge; triangles: Δ-ANCHORED WEDGE CLOSURE): the total
    // for base ∪ Δ is the stored base census plus the triangles closed
    // by genuinely-new edges, found ONLY by probing the merged
    // adjacency from Δ anchors — Σ_δ deg work per batch, never the full
    // wedge census. The oracle recomputes BOTH counts from scratch
    // (full census and base census on the same deterministic (a+b)%7
    // split), so the hash match is the decomposition theorem
    // T(base ∪ Δ) = T(base) + T_new, exactly.
    QueryDef.of("graph_triangles_ivm",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS (
        |  SELECT a.pk AS a, b.pk AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), eb AS (SELECT a, b FROM e WHERE (a + b) % 7 <> 0),
        |tf AS (
        |  SELECT CAST(count(*) AS BIGINT) AS full_t
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), tb AS (
        |  SELECT CAST(count(*) AS BIGINT) AS base_t
        |  FROM eb e1 JOIN eb e2 ON e1.b = e2.a
        |             JOIN eb e3 ON e3.a = e1.a AND e3.b = e2.b
        |)
        |SELECT full_t AS n_triangles, full_t - base_t AS new_triangles
        |FROM tf, tb""".stripMargin) { (s, dir) =>
      // one materialization of the pair derivation (r15): base feeds the
      // census AND the incremental probe, Δ a third subtree — three
      // evaluations of the lineitem self-join before the checkpoint
      val pairs = graft.operators.Caches.checkpointTracked(
        graft.operators.Basket.pairCounts(
            Tables.lineitem(s, dir), basket = "l_orderkey", item = "l_partkey")
          .filter(col("cnt") >= 2)
          .select(col("item_a").as("src"), col("item_b").as("dst")))
      val base = pairs.filter(pmod(col("src") + col("dst"), lit(7)) =!= 0)
      val delta = pairs.filter(pmod(col("src") + col("dst"), lit(7)) === 0)
      val baseCount = graft.operators.Graph.triangleStats(base)
        .select("n_triangles")
      graft.operators.Graph.trianglesIncremental(baseCount, base, delta)
    },

    // DEGREE-VIEW MAINTENANCE under the same edge Δ-batch — the
    // additive half of the graph-IVM pair (components above are the
    // non-additive half): per-node degree is a distributive count, so
    // deg(base ∪ Δ) = deg(base) ⊕ deg(Δ) through the SAME
    // Ivm.mergeAdditive merge the warehouse row certifies
    // (agg_incremental); the oracle counts the whole symmetrized edge
    // set from scratch. Same deterministic (src + dst) mod 7 split as
    // graph_components_ivm, so one Δ-batch story covers both views.
    QueryDef.of("graph_degrees_ivm",
      s"""$strongCoPurchaseCte
        |SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e GROUP BY src ORDER BY node""".stripMargin) { (s, dir) =>
      // one materialization of the symmetrized edge derivation (the
      // graph_mst_ivm r15 note: both half-views aggregate the same frame)
      val e = graft.operators.Caches.checkpointTracked(
        strongCoPurchaseEdges(s, dir))
      def degOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val base = e.filter(pmod(col("src") + col("dst"), lit(7)) =!= 0)
      val delta = e.filter(pmod(col("src") + col("dst"), lit(7)) === 0)
      graft.operators.Ivm.mergeAdditive(degOf(base), degOf(delta),
          "node", Seq("deg"))
        .orderBy("node")
    },

    // INCREMENTAL GRAPH MAINTENANCE certified as an oracle row (the
    // agg_incremental theorem pattern, on a view that is NOT an
    // additive aggregate): the engine maintains the component view
    // under an edge Δ-batch — base components contracted to their
    // min-label representatives, union-find over the ≤|Δ| contracted
    // edges only, touched components re-labeled — while the oracle
    // recomputes min-reachable-id over the WHOLE graph from scratch.
    // The hash match IS the quotient-composition theorem: base edges
    // never rescanned, labels identical. Split is deterministic
    // ((s + d) mod 7) so both engines see the same base/Δ partition of
    // the same co-purchase pair set.
    QueryDef.of("graph_components_ivm", componentsOracle) { (s, dir) =>
      // one materialization of the shared pair derivation (the
      // graph_mst_ivm r15 note: base and Δ filter the same self-join)
      val pr = graft.operators.Caches.checkpointTracked(
        strongCoPurchasePairs(s, dir))
      val base = pr.filter(pmod(col("s") + col("d"), lit(7)) =!= 0)
      val delta = pr.filter(pmod(col("s") + col("d"), lit(7)) === 0)
      // loopParts pinned: a few-thousand-pair graph at every driver SF
      // (the graph_components convention, both loops)
      val baseComp = graft.operators.Graph.connectedComponents(base,
        src = "s", dst = "d", loopParts = 1, localPairsCap = 500000L)
      graft.operators.Graph.componentsIncremental(baseComp, delta,
          src = "s", dst = "d", loopParts = 1, localPairsCap = 500000L)
        .orderBy("node")
    },

    // CORE-NUMBER DECOMPOSITION (every node's maximal k-core) on the
    // same sparse co-purchase graph — the per-k completion of
    // graph_kcore, via the Lü-et-al h-index iteration (h₀ = degree,
    // hₜ₊₁ = h-index of neighbors' hₜ → coreness). 20 rounds is a
    // measured FIXPOINT at every tested SF (sf0.001 needs all 20 — its
    // 200-node graph is dense, degeneracy 15; sf0.01 needs 9, sf0.1
    // needs 4; GraphSpec pins round-21 as a no-op), and extra rounds
    // are idempotent at a fixpoint, so the bounded schedule IS the
    // coreness. All integers — the CTE chain replays bit-for-bit.
    QueryDef.of("graph_corenum", coreNumbersOracle(20)) { (s, dir) =>
      val e = strongCoPurchaseEdges(s, dir)
      graft.operators.Graph.coreNumbers(e, rounds = 20)
        .orderBy("node")
    },

    // PARALLEL LOUVAIN move phase on the co-purchase graph (3
    // synchronous rounds from the all-singletons start, directed
    // Dugué–Perez gain — the same Q graph_modularity scores, so the two
    // compose into a measurable modularity-ascent story). Deterministic
    // BY CONSTRUCTION (simultaneous best moves, ties to the smallest
    // community label — sequential Louvain is visit-order dependent and
    // un-replayable); the gain's every input is an integer and the
    // expression fixed-shape, so the CTE chain replays each round
    // bit-for-bit.
    QueryDef.of("graph_louvain", louvainOracle(3)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      // symmetric = true: the ok-self-join emits (a, b) AND (b, a) —
      // the contract the fast path asserts (one |E| label join/round)
      graft.operators.Graph.louvainMove(e, iterations = 3,
          symmetric = true)
        .orderBy("node")
    },

    // WEIGHTED parallel Louvain on the co-purchase graph weighted by
    // shared-order count: every gain mass a weight sum — communities of
    // basket STRENGTH, not mere adjacency (and the move phase a second
    // Louvain level would run on graph_coarsen's self-looped community
    // graph). With w ≡ 1 this is graph_louvain exactly; here the
    // weights genuinely reorder moves.
    QueryDef.of("graph_louvain_weighted",
      louvainWeightedOracle(3)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      // symmetric = true: w(a→b) = w(b→a) by the self-join's symmetry
      graft.operators.Graph.louvainMoveWeighted(e, iterations = 3,
          symmetric = true)
        .orderBy("node")
    },

    // TWO-LEVEL LOUVAIN — the real Blondel pipeline: move phase on the
    // node graph, AGGREGATE into the self-looped community graph
    // (coarsen), move phase again WEIGHTED on the communities, and map
    // every node to its community's level-2 label. Level 2 operates on
    // ≤C nodes — the hierarchy step that makes Louvain tractable on
    // billion-node graphs (each level shrinks the graph, the expensive
    // |E| work happens once at the bottom). Every stage is the
    // composition of already-certified pieces; the oracle chains the
    // unweighted CTEs, the mixing query, and the prefix-parametrized
    // weighted CTEs in one statement.
    QueryDef.of("graph_louvain2", louvain2Oracle(3, 2)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct()
      // persist level-1 labels: coarsen and the final map-back both
      // consume them — unpersisted, the 3-round loop would replay
      // both levels run the symmetric fast path: e is symmetrized by
      // the ok-self-join, and coarsen of a symmetric graph is symmetric
      // (w(c1→c2) = w(c2→c1); self-loops are their own reverse)
      // e is scanned twice (move + coarsen) — coarsen reads the move
      // loop's checkpointed base, so the self-join runs exactly once
      val (l1raw, base) = graft.operators.Graph.louvainMoveWithBase(e,
        iterations = 3, symmetric = true)
      val l1 = graft.operators.Caches.persistTracked(l1raw)
      val g2 = graft.operators.Graph.coarsen(base.select("src", "dst"), l1)
      // level 2 on the coarse graph takes the DRIVER-LOCAL replay when
      // the community graph fits under the cap (2,777 edges at sf0.1 vs
      // ~5 distributed shuffles × 2 rounds of pure fixed overhead) —
      // bit-identical labels, distributed fallback above the cap
      val l2 = graft.operators.Graph.louvainMoveWeighted(g2,
        iterations = 2, weight = "weight", symmetric = true,
        localEdgeCap = 1000000L)
      l1.join(l2.select(col("node").as("label"),
          col("label").as("label2")), "label")
        .select("node", "label2")
        .orderBy("node")
    },

    // THE HIERARCHY MEASUREMENT: global Q of the TWO-LEVEL partition on
    // the original node graph — the capstone of the ascent story
    // (singletons < LPA(4) < Louvain(3) ≤ Louvain2(3,2), each a
    // certified one-row output on the same graph and the same
    // integer-sum total). Level 2 re-moves COMMUNITIES, so its gains
    // are exactly the coarse-graph modularity deltas — Q here reads the
    // merged partition back on the node graph, where it is directly
    // comparable to graph_louvain_q's number.
    QueryDef.of("graph_louvain2_q", louvain2QOracle(3, 2)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct()
      // the graph_louvain2 composition verbatim (symmetric fast path at
      // both levels), then the level-2 partition's Q through
      // modularityTotalFromCoarse (r16): the composed partition's mixing
      // matrix is an exact long-sum regrouping of the level-1 mixing
      // matrix — which IS the coarsen output already materialized here —
      // so the Q row derives from the 2,777-row community graph instead
      // of a second |E| mixing scan + the |V| label map-back join the
      // old shape paid (bit-identical output; GraphSpec pins the law,
      // the from-scratch oracle pins it driver-side)
      // l1 is consumed ONCE now (coarsen — whose labeledMixing persists
      // its own label copy), so the old query-level persist is gone with
      // the map-back join; the loop already returns a materialized leaf
      val (l1, base) = graft.operators.Graph.louvainMoveWithBase(e,
        iterations = 3, symmetric = true)
      val g2 = graft.operators.Graph.coarsen(base.select("src", "dst"), l1)
      // driver-local level-2 move under the cap (the graph_louvain2
      // rationale) — bit-identical labels either path
      val l2 = graft.operators.Graph.louvainMoveWeighted(g2,
        iterations = 2, weight = "weight", symmetric = true,
        localEdgeCap = 1000000L)
      graft.operators.Graph.modularityTotalFromCoarse(g2, l2)
    },

    // LOUVAIN AGGREGATION PHASE: the Louvain(3) partition collapsed to
    // its weighted community graph (self-loops = within-community mass,
    // the convention a second-level pass needs) — "which bought-together
    // neighborhoods talk to each other", community-level structure fed
    // back through the graph toolkit. One |E|-shuffle to ≤C² rows.
    QueryDef.of("graph_coarsen", coarsenOracle(3)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct()
      // e is scanned twice (move + coarsen): a query-level persist of
      // the self-join measured a WASH (13.6 s persisted vs 14.1
      // unpersisted — the extra materialization costs what the recompute
      // saves), but the move loop CHECKPOINTS its distinct-edge base
      // regardless, so coarsen reads that free materialization instead
      // of recomputing the self-join
      val (labels, base) = graft.operators.Graph.louvainMoveWithBase(e,
        iterations = 3, symmetric = true)
      graft.operators.Graph.coarsen(base.select("src", "dst"), labels)
        .orderBy("src", "dst")
    },

    // THE ASCENT MEASUREMENT: global Q of the Louvain(3) partition on
    // the same graph, through the same integer-sum total as
    // graph_modularity_q — putting a certified number on "the move
    // phase found denser communities than label propagation" (compare
    // the two one-row outputs directly).
    QueryDef.of("graph_louvain_q", louvainQOracle(3)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct() // modularity's simple-graph m
      // e is scanned TWICE (the move loop's checkpoint base and the
      // mixing matrix) — the loop CHECKPOINTS its distinct-edge base
      // anyway, so the mixing matrix reads that one materialization
      // instead of a second self-join (or a redundant persist of it)
      val (labels, base) = graft.operators.Graph.louvainMoveWithBase(e,
        iterations = 3, symmetric = true)
      graft.operators.Graph.modularityTotal(
        base.select("src", "dst"), labels)
    },

    // MODULARITY of the LPA(4) partition on the co-purchase graph
    // (Leicht–Newman directed Q, which on this symmetrized edge list is
    // Newman's undirected Q): per-community q_c = e_c/m − out_c·in_c/m² —
    // "how much denser than chance is each bought-together community",
    // the quality score for graph_lpa's output. Every q_c input is an
    // integer count (ONE |E|-shuffle → the C×C mixing matrix, then tiny
    // marginals), and the single double expression is fixed-shape, so
    // the oracle mirrors it with no summation-order ambiguity.
    QueryDef.of("graph_modularity", modularityOracle(4)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // distinct HERE: modularity (unlike pageRank/labelPropagation)
      // takes edges as given — a multigraph is a legitimate input — so
      // the co-purchase multiplicity must collapse before m is counted
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct()
      // the mixing matrix reads the LPA loop's checkpointed base (row
      // multiset = e — the query already distincts) instead of paying
      // the lineitem self-join a second time (r15; the
      // louvainMoveWithBase idiom)
      val (labels, base) =
        graft.operators.Graph.labelPropagationWithBase(e, iterations = 4)
      graft.operators.Graph.modularity(base, labels)
        .orderBy("label")
    },

    // GLOBAL modularity Q = Σ_c q_c of the same partition — computed
    // from exact integer sums (W = Σ e_c, P = Σ out_c·in_c), never by
    // summing C per-community doubles (order-dependent), then the same
    // cast-then-divide shape: Q = W/m − P/m². One row.
    QueryDef.of("graph_modularity_q", modularityTotalOracle(4)) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // distinct for the same multigraph reason as graph_modularity
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct()
      // base-reuse for the mixing matrix (the graph_modularity r15 note)
      val (labels, base) =
        graft.operators.Graph.labelPropagationWithBase(e, iterations = 4)
      graft.operators.Graph.modularityTotal(base, labels)
    },

    // K-ANONYMITY RISK AUDIT (Sweeney) — the re-identification
    // diagnostic next to data_quality's integrity gate: customers
    // grouped by the quasi-identifier (nation, segment, 1000-wide
    // balance bucket); for each adversary strength k ∈ {2,3,5,10}, how
    // many QI groups fall below size k and how many CUSTOMERS sit in
    // them. All integer (the bucket is one deterministic floor of a
    // double, mirrored with the CAST-spelled literal — the DuckDB
    // DECIMAL pitfall); one grouped pass + one stacked aggregate.
    QueryDef.of("kanon_risk",
      """WITH q AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / CAST(1000.0 AS DOUBLE)) AS BIGINT) AS bal_b
        |  FROM customer
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS sz FROM q
        |  GROUP BY c_nationkey, c_mktsegment, bal_b
        |), a AS (
        |  SELECT
        |    CAST(count(CASE WHEN sz < 2 THEN 1 END) AS BIGINT) AS g2,
        |    CAST(coalesce(sum(CASE WHEN sz < 2 THEN sz END), 0) AS BIGINT) AS r2,
        |    CAST(count(CASE WHEN sz < 3 THEN 1 END) AS BIGINT) AS g3,
        |    CAST(coalesce(sum(CASE WHEN sz < 3 THEN sz END), 0) AS BIGINT) AS r3,
        |    CAST(count(CASE WHEN sz < 5 THEN 1 END) AS BIGINT) AS g5,
        |    CAST(coalesce(sum(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT) AS r5,
        |    CAST(count(CASE WHEN sz < 10 THEN 1 END) AS BIGINT) AS g10,
        |    CAST(coalesce(sum(CASE WHEN sz < 10 THEN sz END), 0) AS BIGINT) AS r10
        |  FROM g
        |)
        |SELECT * FROM (
        |  SELECT CAST(2 AS BIGINT) AS k, g2 AS n_groups_below, r2 AS n_rows_at_risk FROM a
        |  UNION ALL SELECT 3, g3, r3 FROM a
        |  UNION ALL SELECT 5, g5, r5 FROM a
        |  UNION ALL SELECT 10, g10, r10 FROM a
        |) ORDER BY k""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_b"))
      graft.operators.Privacy.kAnonymityRisk(c,
          Seq(col("c_nationkey"), col("c_mktsegment"), col("bal_b")),
          Seq(2, 3, 5, 10))
        .orderBy("k")
    },

    // Declarative data-quality audit over the star schema — the
    // expectation gate an ingest pipeline runs before data goes live.
    // Every non-FK rule on a table folds into ONE single-scan aggregate;
    // FK rules are keys-only broadcast-join passes (see Quality's
    // scaladoc). The report exposes real findings in this data: the
    // lineitem (l_orderkey, l_linenumber) pair is NOT unique (~14k extra
    // rows at sf0.01), 122 customers carry negative balances, and ~600
    // orders exceed the 400k price cap — alongside the passing not-null /
    // FK / accepted-values checks. Counts are exact integers; no doubles.
    QueryDef.of("data_quality",
      """SELECT 'customer' AS tbl, 'range:c_acctbal' AS rule,
        |  CAST(sum(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  CAST(count(*) AS BIGINT) AS total FROM customer
        |UNION ALL
        |SELECT 'customer', 'unique:c_custkey',
        |  CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT), CAST(count(*) AS BIGINT)
        |FROM customer
        |UNION ALL
        |SELECT 'lineitem', 'fk:l_orderkey->orders.o_orderkey',
        |  CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |  ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT 'lineitem', 'not_null:l_shipdate',
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem', 'range:l_discount',
        |  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'lineitem', 'unique:l_orderkey,l_linenumber',
        |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'orders', 'fk:o_custkey->customer.c_custkey',
        |  CAST(sum(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |  ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'orders', 'in_set:o_orderstatus',
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'orders', 'not_null:o_custkey',
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'orders', 'range:o_totalprice',
        |  CAST(sum(CASE WHEN o_totalprice < 1.0 OR o_totalprice > 400000.0 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'orders', 'unique:o_orderkey',
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT), CAST(count(*) AS BIGINT)
        |FROM orders
        |ORDER BY tbl, rule""".stripMargin) { (s, dir) =>
      import graft.operators.Quality
      import graft.operators.Quality._
      val customer = Tables.customer(s, dir)
      val orders = Tables.orders(s, dir)
      val lineitem = Tables.lineitem(s, dir)
      val reports = Seq(
        "customer" -> Quality.audit(customer, Seq(
          Range("c_acctbal", lo = Some(0.0)),
          Unique(Seq("c_custkey")))),
        "lineitem" -> Quality.audit(lineitem, Seq(
          NotNull("l_shipdate"),
          Range("l_discount", lo = Some(0.0), hi = Some(0.1)),
          Unique(Seq("l_orderkey", "l_linenumber")),
          ForeignKey("l_orderkey", orders, "orders", "o_orderkey"))),
        "orders" -> Quality.audit(orders, Seq(
          NotNull("o_custkey"),
          Range("o_totalprice", lo = Some(1.0), hi = Some(400000.0)),
          InSet("o_orderstatus", Seq("F", "O", "P")),
          Unique(Seq("o_orderkey")),
          ForeignKey("o_custkey", customer, "customer", "c_custkey"))))
      reports.map { case (t, rep) =>
        rep.select(lit(t).as("tbl"), col("rule"), col("violations"),
          col("total"))
      }.reduce(_ unionAll _).orderBy("tbl", "rule")
    },

    // Unpivot / melt — wide measure columns to long (measure, value) rows,
    // the feature-table → training-example-stream reshape (inverse of
    // pivot_agg). Uses the built-in Dataset.unpivot, which plans as ONE
    // Expand over the scan (no join, no shuffle; 4× row fan-out, same as
    // table_profile's documented Expand trade). The pushed-down key filter
    // composes with the Expand — predicate pushdown survives the reshape.
    // Doubles are stored values untouched by arithmetic → bit-exact.
    QueryDef.of("unpivot_melt",
      """WITH f AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |         l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey % 97 = 0
        |)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |       l_quantity AS value FROM f
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM f
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM f
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM f
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(pmod(col("l_orderkey"), lit(97L)) === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // Snapshot diff — the table-versioning delta (Delta/Iceberg
    // time-travel DIFF; nightly crawl-snapshot comparison): classify every
    // key as added / removed / changed with old and new values side by
    // side, unchanged keys dropped (at 100 TB you ship the delta, never
    // the intersection). ONE full-outer join, AQE-managed; no window. The
    // "new" snapshot is derived deterministically from the corpus (removes
    // at key%13=0, a priority rewrite at %13=1, inserts at %13=2 offset
    // +10M) so the oracle replays derivation + diff exactly.
    QueryDef.of("snapshot_diff",
      """WITH b AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |), n AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 1 THEN '0-RUSH'
        |         ELSE o_orderpriority END AS o_orderpriority
        |  FROM b WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_orderpriority
        |  FROM b WHERE o_orderkey % 13 = 2
        |)
        |SELECT COALESCE(b.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'A'
        |       WHEN n.o_orderkey IS NULL THEN 'R'
        |       ELSE 'C' END AS change,
        |  b.o_orderstatus AS old_o_orderstatus,
        |  n.o_orderstatus AS new_o_orderstatus,
        |  b.o_orderpriority AS old_o_orderpriority,
        |  n.o_orderpriority AS new_o_orderpriority
        |FROM b FULL JOIN n ON b.o_orderkey = n.o_orderkey
        |WHERE b.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |   OR b.o_orderpriority IS DISTINCT FROM n.o_orderpriority
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import graft.operators.Snapshot
      val base = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      val mod13 = pmod(col("o_orderkey"), lit(13L))
      val newSnap = base.filter(mod13 =!= 0)
        .withColumn("o_orderpriority",
          when(mod13 === 1, lit("0-RUSH")).otherwise(col("o_orderpriority")))
        .unionByName(base.filter(mod13 === 2)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_orderpriority")))
      Snapshot.diff(base, newSnap, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // SCD Type 2 history: each customer's order-status runs as validity
    // intervals — change-detection lag + closing lead, windows PARTITIONED
    // by the customer key (bounded per-key history; the Kimball dimension
    // primitive and the temporal completion of upsert_merge's
    // latest-wins). `version` (run ordinal) makes the output order total
    // even when several runs open on the same date. Times in integer µs
    // (the events-tier currency); valid_to null = current version.
    QueryDef.of("scd2_history",
      """WITH e AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus,
        |         epoch_us(o_orderdate) AS us
        |  FROM orders
        |), m AS (
        |  SELECT o_custkey, o_orderstatus, us, o_orderkey,
        |    lag(o_orderstatus) OVER w AS prev
        |  FROM e WINDOW w AS (PARTITION BY o_custkey ORDER BY us, o_orderkey)
        |), c AS (
        |  SELECT o_custkey, o_orderstatus, us, o_orderkey FROM m
        |  WHERE prev IS NULL OR prev <> o_orderstatus
        |), r AS (
        |  SELECT o_custkey, o_orderstatus,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    us AS valid_from_us,
        |    lead(us) OVER w AS valid_to_us
        |  FROM c WINDOW w AS (PARTITION BY o_custkey ORDER BY us, o_orderkey)
        |)
        |SELECT o_custkey, o_orderstatus, version, valid_from_us, valid_to_us
        |FROM r ORDER BY o_custkey, version""".stripMargin) { (s, dir) =>
      import graft.operators.Scd
      Scd.history(Tables.orders(s, dir), key = "o_custkey",
          tsCol = "o_orderdate", tieCol = "o_orderkey",
          attrs = Seq("o_orderstatus"))
        .select(col("o_custkey"), col("o_orderstatus"), col("version"),
          unix_micros(col("valid_from").cast("timestamp")).as("valid_from_us"),
          unix_micros(col("valid_to").cast("timestamp")).as("valid_to_us"))
        .orderBy("o_custkey", "version")
    },

    // Multi-touch LINEAR attribution: every purchase splits its value
    // equally across the user's clicks in the 24 h lookback (tc ≤ tp,
    // tp − tc < 24 h — µs-integer half-open window, the events_funnel
    // currency). Output is the (purchase, click, credit) PAIR set — per
    // pair, credit = value / n_touch is ONE IEEE division of a stored
    // double by an exact integer, bit-replayable; emitting pairs instead
    // of per-click credit SUMS is deliberate (a sum of credits would be
    // partition-order nondeterministic — downstream rollups can fold the
    // pairs under whatever order they pin). Plan: user-key equi-join
    // bounded by per-user activity in the window, pairs tracked-persist
    // feeding the n_touch partial agg + the final join — no window, no
    // driver materialization.
    QueryDef.of("events_attribution",
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value
        |  FROM events
        |), p AS (
        |  SELECT event_id AS purchase_id, user_id, us AS tp, value
        |  FROM e WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS click_id, user_id, us AS tc
        |  FROM e WHERE event_type = 'click'
        |), pairs AS (
        |  SELECT p.purchase_id, c.click_id, p.value
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.tc <= p.tp AND p.tp - c.tc < 86400000000
        |), n AS (
        |  SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_touch
        |  FROM pairs GROUP BY purchase_id
        |)
        |SELECT pr.purchase_id, pr.click_id,
        |  pr.value / CAST(n.n_touch AS DOUBLE) AS credit
        |FROM pairs pr JOIN n ON pr.purchase_id = n.purchase_id
        |ORDER BY pr.purchase_id, pr.click_id""".stripMargin) { (s, dir) =>
      import graft.operators.Caches
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("tp"), col("value"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("tc"))
      val pairs = Caches.persistTracked(p.join(c, "user_id")
        .filter(col("tc") <= col("tp") &&
          col("tp") - col("tc") < lit(86400000000L))
        .select("purchase_id", "click_id", "value"))
      val n = pairs.groupBy("purchase_id").agg(count(lit(1)).as("n_touch"))
      pairs.join(n, "purchase_id")
        .select(col("purchase_id"), col("click_id"),
          (col("value") / col("n_touch").cast("double")).as("credit"))
        .orderBy("purchase_id", "click_id")
    },

    // 2-D Pareto frontier — multi-objective selection (parts no other part
    // beats on BOTH size and price): the curation pattern behind
    // quality-vs-length frontiers, without a weighted scalarization. The
    // bounded-x collapse (per-size max price, ≤ |size domain| candidates)
    // makes the dominance test a bounded-by-construction nested-loop
    // anti-join (the events_resample allowlist class) — nothing data-sized
    // ever meets an inequality join; winners semi-join back keeping ties.
    // y doubles are selected/compared, never arithmetic → bit-exact.
    QueryDef.of("pareto_frontier",
      """WITH m AS (
        |  SELECT p_size AS x, max(p_retailprice) AS y FROM part GROUP BY p_size
        |), f AS (
        |  SELECT x, y FROM m p WHERE NOT EXISTS (
        |    SELECT 1 FROM m q
        |    WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y))
        |)
        |SELECT p.p_partkey, p.p_size, p.p_retailprice
        |FROM part p JOIN f ON p.p_size = f.x AND p.p_retailprice = f.y
        |ORDER BY p.p_size, p.p_partkey""".stripMargin) { (s, dir) =>
      import graft.operators.Pareto
      Pareto.frontier2d(
          Tables.part(s, dir).select("p_partkey", "p_size", "p_retailprice"),
          "p_size", "p_retailprice")
        .orderBy("p_size", "p_partkey")
    }
  )
}
