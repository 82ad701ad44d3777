package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * EXACT per-group percentiles over an UNBOUNDED double column WITHOUT a
 * sort — iterative histogram refinement (distributed selection), the
 * third point of the engine's percentile triad:
 *
 *  - bounded integer domain  → one-histogram exact (`quantile_exact`);
 *  - unbounded domain, exact → THIS (radix descent, O(log_fanout n)
 *    partial-agg passes, each emitting ≤ |groups|·fanout rows);
 *  - unbounded domain, one pass, approximate → `quantile_sketch`.
 *
 * Algorithm (classic distributed selection): per group, split the value
 * range into buckets by the canonical per-row expression
 * B_l(v) = min(floor((v − lo₀) / step_l), fanout^l − 1) and count rows
 * per bucket (ONE partial-aggregated pass serves every group — each
 * group's lo₀/step_l are plan-time constants in a when-chain over the
 * bounded group set); the driver walks the ≤ fanout counts inside the
 * previously-chosen parent bucket to find the child holding the target
 * rank, rebases the rank into it, and recurses with
 * step_{l+1} = step_l / fanout. Once a selector's bucket holds
 * ≤ `collectLimit` rows, a final pass groups that bucket's rows by the
 * exact double value and the driver reads the rank off the per-value
 * counts. The answer is the exact r-th smallest STORED double — no
 * arithmetic ever touches the value on the way out, so an oracle
 * selecting the same rank from a sort produces the identical bits.
 *
 * Floating-point care — why the recursion is EXACT, not approximately
 * nested: `fanout` must be a power of two (asserted). Then
 * step_{l+1} = step_l / fanout is an exponent shift (no mantissa
 * rounding), and IEEE division commutes with power-of-two scaling, so
 * floor(B_{l+1}(v) / fanout) = B_l(v) for EVERY v — child buckets
 * partition their parent bit-exactly and rank bookkeeping can never
 * drift at a bucket edge. The clamp at fanout^l − 1 composes the same
 * way (only max-value rows clamp, consistently at every level).
 *
 * Scale shape: rank selection at 100 TB costs the stats pass + L
 * histogram passes + one value pass per terminal level, with
 * L = ⌈log_fanout(n_group / collectLimit)⌉ — n = 10¹² rows at
 * fanout 4096 / collectLimit 10⁵ gives L = 2. Every pass is a
 * map-side-combined groupBy emitting ≤ |groups|·fanout rows; the only
 * driver materializations are those bounded histograms and the final
 * ≤ collectLimit per-value counts. A sort-based exact per-group
 * percentile would shuffle the whole table into per-key sorts (the
 * cost `quantile_sketch`'s scaladoc warns about); this shuffles
 * nothing but histogram rows. Group cardinality must be driver-bounded
 * — the same contract as `heavy_hitters`' capacity. After `maxLevels`
 * the bucket spans range/fanout^maxLevels (≈ range/2⁴⁸ at defaults);
 * the final pass then collects per-DISTINCT-value counts of that
 * sliver, bounded by `collectLimit` in every non-adversarial geometry
 * (and loudly `require`-checked, never silently truncated).
 *
 * Degenerates: empty groups are absent from the output; an all-equal
 * group resolves without descent; NULLs are excluded (percentile of the
 * non-null population, standard SQL aggregate semantics).
 */
object Quantiles {

  /** (output column, rank numerator, rank denominator): percentile
    * num/den is the value at 1-based sorted position
    * ((n − 1) · num) / den + 1 — integer floor division, the repo's
    * standard discrete nearest-rank definition (`quantile_sketch`). */
  val defaultPcts: Seq[(String, Int, Int)] =
    Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  def exactPercentilesByRadix(df: DataFrame, key: String, value: String,
      pcts: Seq[(String, Int, Int)] = defaultPcts, fanout: Int = 4096,
      collectLimit: Long = 100000L, maxLevels: Int = 4): DataFrame = {
    require(fanout >= 2 && (fanout & (fanout - 1)) == 0,
      s"fanout must be a power of two (exact step refinement), got $fanout")
    require(pcts.nonEmpty && maxLevels >= 1)
    val spark = df.sparkSession
    val src = df.select(col(key).cast("string").as("k"),
      col(value).cast("double").as("v")).filter(col("v").isNotNull)

    // pass 0: per-group count/min/max (bounded: |groups| rows collected)
    val stats = src.groupBy("k")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val groups = stats.keys.toSeq.sorted

    val lo0 = stats.view.mapValues(_._2).toMap
    val step1 = stats.view.mapValues { case (_, lo, hi) =>
      // constant groups (hi == lo) never descend; 1.0 keeps the expr sane
      if (hi > lo) (hi - lo) / fanout else 1.0
    }.toMap
    // step at level l: an EXACT power-of-two scaling of step1 (see
    // scaladoc); fanout^(l-1) ≤ 2^48 at defaults — exactly representable
    def stepAt(g: String, l: Int): Double =
      step1(g) / math.pow(fanout.toDouble, (l - 1).toDouble)
    // canonical bucket expression at level l, all groups in one when-chain
    def bucketExpr(l: Int): Column = {
      val maxB = math.pow(fanout.toDouble, l.toDouble).toLong - 1
      groups.foldLeft(lit(null).cast("long")) { (acc, g) =>
        when(col("k") === g,
          least(floor((col("v") - lit(lo0(g))) / lit(stepAt(g, l))).cast("long"),
            lit(maxB))).otherwise(acc)
      }
    }

    // selector: one (group, percentile) target. level = the level its
    // `bucket` index lives at (0 = the whole group, bucket ignored);
    // rank = 1-based rank within that bucket; count = rows in it.
    final class Sel(val g: String, val name: String, var rank: Long,
      var level: Int, var bucket: Long, var count: Long,
      var done: Boolean = false, var result: Double = 0.0)
    val sels: Seq[Sel] = groups.flatMap { g =>
      val (n, lo, hi) = stats(g)
      pcts.map { case (nm, num, den) =>
        val s = new Sel(g, nm, rank = (n - 1) * num / den + 1,
          level = 0, bucket = 0L, count = n)
        if (lo == hi) { s.done = true; s.result = lo }
        s
      }
    }

    // descent: all still-too-big selectors share one histogram pass per
    // level (they are always in lockstep — a selector is active at level
    // l exactly when it descended at every level before l)
    var level = 1
    while (sels.exists(s => !s.done && s.count > collectLimit) && level <= maxLevels) {
      val active = sels.filter(s => !s.done && s.count > collectLimit)
      val rowFilter = active.map(_.g).distinct.map { g =>
        val base = col("k") === g
        if (level == 1) base
        else {
          val parents = active.filter(_.g == g).map(_.bucket).distinct
          base && bucketExpr(level - 1).isInCollection(parents)
        }
      }.reduce(_ || _)
      val hist = src.filter(rowFilter)
        .groupBy(col("k"), bucketExpr(level).as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val byGroup = hist.groupBy(_._1)
      for (s <- active) {
        // this selector's slice: its parent's children, value-ascending
        // (bucket index order IS value order); exact refinement makes
        // b DIV fanout the precise parent test
        val slice = byGroup.getOrElse(s.g, Array.empty)
          .filter { case (_, b, _) => level == 1 || b / fanout == s.bucket }
          .sortBy(_._2)
        var acc = 0L; var i = 0; var found = false
        while (!found && i < slice.length) {
          val (_, b, c) = slice(i)
          if (acc + c >= s.rank) {
            s.rank -= acc; s.bucket = b; s.count = c; s.level = level
            found = true
          } else { acc += c; i += 1 }
        }
        require(found, s"radix walk lost rank for ${s.g}/${s.name} at level $level")
      }
      level += 1
    }

    // final exact pass(es): per terminal level, per-value counts inside
    // each pending selector's bucket — each a bounded collect (count ≤
    // collectLimit by the loop guard, or a ≤ range/fanout^maxLevels
    // sliver past maxLevels)
    for (lvl <- sels.filter(!_.done).map(_.level).distinct.sorted) {
      val pend = sels.filter(s => !s.done && s.level == lvl)
      val f = pend.map(_.g).distinct.map { g =>
        val base = col("k") === g
        if (lvl == 0) base
        else base && bucketExpr(lvl)
          .isInCollection(pend.filter(_.g == g).map(_.bucket).distinct)
      }.reduce(_ || _)
      val bcol = if (lvl == 0) lit(0L) else bucketExpr(lvl)
      val vals = src.filter(f)
        .groupBy(col("k"), bcol.as("b"), col("v"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val byKey = vals.groupBy(t => (t._1, t._2))
      for (s <- pend) {
        val slice = byKey
          .getOrElse((s.g, if (lvl == 0) 0L else s.bucket), Array.empty)
          .sortBy(_._3)
        var acc = 0L; var i = 0
        while (!s.done && i < slice.length) {
          val (_, _, v, c) = slice(i)
          if (acc + c >= s.rank) { s.done = true; s.result = v }
          else { acc += c; i += 1 }
        }
        require(s.done, s"radix final pass lost rank for ${s.g}/${s.name}")
      }
    }

    // assemble (key, n_rows, <pct columns...>) — |groups| rows
    val names = pcts.map(_._1)
    val rows = groups.map { g =>
      val m = sels.filter(_.g == g).map(s => s.name -> s.result).toMap
      Row.fromSeq(g +: stats(g)._1 +: names.map(m))
    }
    val schema = StructType(
      StructField(key, StringType) :: StructField("n_rows", LongType) ::
        names.map(StructField(_, DoubleType)).toList)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
