package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CDC upsert merge (the MERGE INTO / apply-changes primitive): fold a
 * change batch of inserts / updates / deletes into a base table by key.
 * Extension tier: the reference is strictly single-input batch
 * (`MapReduceFramework.cpp:360` takes ONE vector; SURVEY.md §2.7).
 *
 * Semantics (last-writer-wins):
 *  - several changes on one key → the highest `seqCol` wins (resolved by a
 *    partial-aggregated `max_by` over the CHANGE batch only — never a
 *    window over the base);
 *  - 'D' drops the base row; 'U' and 'I' both UPSERT (payload replaces the
 *    base row's payload columns, or creates the row if absent — the
 *    insert-vs-update distinction is the caller's intent, not a constraint
 *    the engine can cheaply enforce at 100 TB);
 *  - base rows without a change pass through untouched; payload columns the
 *    change batch doesn't carry keep their base values (null on inserts).
 *
 * Scale shape: one `full_outer` shuffle join on the key — the change batch
 * is typically orders of magnitude smaller than the base, so AQE picks a
 * broadcast/skew-safe physical join on its own; no driver materialization
 * anywhere.
 */
object Merge {

  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op", seqCol: Option[String] = None): DataFrame = {
    val payload = changes.columns.filterNot(c =>
      c == key || c == opCol || seqCol.contains(c)).toSeq
    require(payload.forall(base.columns.contains),
      s"merge: change payload columns must exist in base " +
        s"(extra: ${payload.filterNot(base.columns.contains).mkString(",")})")

    // collapse to one winning change per key BEFORE the join
    val latest = seqCol match {
      case Some(s) =>
        val packed = struct((opCol +: payload).map(col): _*)
        changes.groupBy(col(key)).agg(max_by(packed, col(s)).as("_c"))
          .select(col(key) +: (opCol +: payload).map(c => col(s"_c.$c").as(c)): _*)
      case None => changes.select((key +: opCol +: payload).map(col): _*)
    }

    val chg = latest.select(
      (col(key).as("_k") +: col(opCol).as("_op") +:
        payload.map(c => col(c).as(s"_c_$c"))): _*)
    val joined = base.join(chg, base(key) === chg("_k"), "full_outer")
    val upsert: Column = col("_op").isin("U", "I")
    joined
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(coalesce(base(key), col("_k")).as(key) +:
        base.columns.filterNot(_ == key).toSeq.map { c =>
          if (payload.contains(c)) when(upsert, col(s"_c_$c")).otherwise(col(c)).as(c)
          else col(c)
        }: _*)
  }
}
