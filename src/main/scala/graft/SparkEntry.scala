package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{LlmQueries, ParityQueries, QueryDef, StarQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** The full named-query surface: reference-parity tier (SURVEY.md §2),
    * star-schema analytics tier, and the LLM-data-pipeline tier. */
  val allQueries: Seq[QueryDef] =
    ParityQueries.defs ++ StarQueries.defs ++ LlmQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The complete Search-client pipeline (`Search.cpp:61-81` +
    * `MapReduceFramework.cpp:341`) restated over the `part` table. */
  def entry(spark: SparkSession): DataFrame =
    queries("search_parity")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
