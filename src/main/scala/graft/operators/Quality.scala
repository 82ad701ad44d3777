package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality audit — the expectation-checking stage every
 * large-scale ingest pipeline runs before data is allowed downstream
 * (the Deequ / Great-Expectations shape, re-expressed as plain Catalyst
 * aggregates). Extension tier: the reference has no validation surface at
 * all; a 100 TB training-data pipeline cannot live without one.
 *
 * Design for scale:
 *  - Every ROW-LOCAL rule (not-null, range, in-set) and every UNIQUE rule
 *    compiles into ONE aggregate over ONE scan of the table — a
 *    `sum(CASE...)` / `count(DISTINCT ...)` column each — so adding checks
 *    adds expressions, not passes. Spark plans the whole bundle as a
 *    partially-aggregated (map-side-combined) single-row aggregate.
 *  - FOREIGN-KEY rules join child keys against the DISTINCT parent key set
 *    (broadcast — parent keys are dimension-sized; for a fact-sized parent
 *    use [[Bloom]]'s semi-join to pre-filter). One pass per FK rule, keys
 *    only, never the payload columns.
 *  - Output is a tiny (rule, violations, total) report — violation ROWS are
 *    deliberately not materialized (a 100 TB table with 1% violations is
 *    1 TB of rows; count first, fetch offenders with a targeted filter).
 *
 * Null semantics (mirrored by the SQL oracle op-for-op): range / in-set
 * violations require a NON-NULL value that fails the predicate (null
 * tracking is [[NotNull]]'s job); FK violations require a non-null child
 * key with no parent; [[Unique]] counts rows beyond the first per
 * duplicate key (`count(*) - count(DISTINCT keys)`).
 */
object Quality {

  sealed trait Rule { def name: String }

  /** `column` must not be null. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null:$column"
  }

  /** `column` (when non-null) must lie in [lo, hi]; either bound optional. */
  final case class Range(column: String, lo: Option[Double] = None,
      hi: Option[Double] = None) extends Rule {
    val name = s"range:$column"
  }

  /** `column` (when non-null) must be one of `allowed`. */
  final case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val name = s"in_set:$column"
  }

  /** The column tuple must be unique across the table; violations =
    * `count(*) - count(DISTINCT cols)` — rows beyond the first per
    * duplicate key, PLUS any null-keyed rows (count(DISTINCT) skips
    * nulls in both engines; a null key cannot be asserted unique —
    * pair with [[NotNull]] to attribute them). */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Every non-null `column` must have a match in `parent.parentColumn`. */
  final case class ForeignKey(column: String, parent: DataFrame,
      parentName: String, parentColumn: String) extends Rule {
    val name = s"fk:$column->$parentName.$parentColumn"
  }

  /** Violation-count expression for a single-pass (non-FK) rule. */
  private def violations(r: Rule): Column = r match {
    case NotNull(c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case Range(c, lo, hi) =>
      val below = lo.map(col(c) < _).getOrElse(lit(false))
      val above = hi.map(col(c) > _).getOrElse(lit(false))
      sum(when(below || above, 1L).otherwise(0L))
    case InSet(c, allowed) =>
      sum(when(!col(c).isin(allowed: _*), 1L).otherwise(0L))
    case Unique(cols) =>
      count(lit(1)) - count_distinct(col(cols.head), cols.tail.map(col): _*)
    case _: ForeignKey =>
      throw new IllegalArgumentException("FK rules are join-evaluated")
  }

  /**
   * Audit `df` against `rules` → one (rule, violations, total) row per
   * rule, in the given rule order. One scan evaluates every non-FK rule;
   * each FK rule adds one keys-only broadcast-join pass.
   */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    val (fks, local) = rules.partition(_.isInstanceOf[ForeignKey])

    val localReport: Option[DataFrame] =
      if (local.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__total") +:
          local.zipWithIndex.map { case (r, i) => violations(r).as(s"__v$i") }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Some(row.select(explode(array(local.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"), col(s"__v$i").as("violations"),
            col("__total").as("total"))
        }: _*)).as("r")).select("r.*"))
      }

    val fkReports = fks.map { case fk @ ForeignKey(c, parent, _, pc) =>
      df.select(col(c))
        .join(broadcast(parent.select(col(pc).as("__pk")).distinct()),
          col(c) === col("__pk"), "left")
        .agg(count(lit(1)).as("total"),
          sum(when(col(c).isNotNull && col("__pk").isNull, 1L).otherwise(0L))
            .as("violations"))
        .select(lit(fk.name).as("rule"), col("violations"), col("total"))
    }

    (localReport.toSeq ++ fkReports)
      .reduceOption(_ unionAll _)
      .getOrElse(spark.emptyDataFrame)
  }
}
