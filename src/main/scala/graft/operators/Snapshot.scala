package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot diff — the table-versioning primitive (what Delta/Iceberg
 * time-travel DIFF or a nightly crawl-snapshot comparison computes): given
 * two versions of a keyed table, classify every key as added ('A'),
 * removed ('R') or changed ('C'), with the old and new value of every
 * compared column side by side. Unchanged keys are dropped — at 100 TB the
 * interesting output is the (small) delta, never the (huge) intersection.
 * Extension tier: the reference is strictly single-input batch
 * (`MapReduceFramework.cpp:360`; SURVEY.md §2.7).
 *
 * Scale shape: ONE full-outer shuffle join on the key — no window, no
 * driver materialization; AQE handles skew/broadcast. Column comparison is
 * null-safe (`<=>`), so a null→value transition counts as a change rather
 * than vanishing.
 */
object Snapshot {

  /** Diff `newDf` against `oldDf` by `keys`. Both frames must share the
    * key columns (which must be non-null — presence is detected through
    * them); every shared non-key column is compared. Output: keys,
    * `change` ('A'/'R'/'C'), then `old_<c>`/`new_<c>` per compared
    * column. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val compared = oldDf.columns.filterNot(keys.contains)
      .filter(newDf.columns.contains).toSeq
    // string-qualified alias resolution — the two sides may share lineage
    // (a derived snapshot), where Dataset-instance column refs are
    // ambiguous under failAmbiguousSelfJoin
    val o = oldDf.select((keys ++ compared).map(col): _*).alias("_old")
    val n = newDf.select((keys ++ compared).map(col): _*).alias("_new")
    def oc(c: String): Column = col(s"_old.$c")
    def nc(c: String): Column = col(s"_new.$c")
    val joinCond = keys.map(k => oc(k) <=> nc(k)).reduce(_ && _)
    val anyDiff: Column = compared
      .map(c => !(oc(c) <=> nc(c)))
      .foldLeft(lit(false))(_ || _)
    o.join(n, joinCond, "full_outer")
      .withColumn("change",
        when(oc(keys.head).isNull, lit("A"))
          .when(nc(keys.head).isNull, lit("R"))
          .when(anyDiff, lit("C")))
      .filter(col("change").isNotNull)
      .select(
        keys.map(k => coalesce(oc(k), nc(k)).as(k)) ++
          Seq(col("change")) ++
          compared.flatMap(c => Seq(oc(c).as(s"old_$c"), nc(c).as(s"new_$c"))): _*)
  }
}
