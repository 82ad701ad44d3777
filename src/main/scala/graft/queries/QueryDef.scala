package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One named query in the engine's public surface: the Spark implementation
 * plus (when SQL-expressible) the equivalent DuckDB oracle SQL the driver
 * uses for hash-parity checking. Column names/aliases MUST match between the
 * two — the driver sorts columns by name before hashing.
 */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def of(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
