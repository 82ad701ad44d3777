package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/**
 * Parity tier: one named query per reference operator (SURVEY.md §2), each
 * restated over the driver's TPC-H-ish tables and checked against a DuckDB
 * oracle. The reference operators are: substring filter (P1, `Search.cpp:65`),
 * literal projection (P2, `Search.cpp:66-68`), flatMap multiplicity (M1),
 * group-by-key-value + count (G1/R3, `MapReduceFramework.cpp:166-230`,
 * `Search.cpp:74`), global sort (O1, `MapReduceFramework.cpp:341`),
 * concatenation-union (O2, `MapReduceFramework.cpp:338-340`), and the Search
 * client's presentation expansion (S3, `Search.cpp:113-117`).
 */
object ParityQueries {

  val defs: Seq[QueryDef] = Seq(

    // Flagship: the complete Search pipeline (scan → contains-filter →
    // group-count → sort), `Search.cpp:61-81` + `MapReduceFramework.cpp:341`.
    QueryDef.of("search_parity",
      """SELECT p_name AS file_name, CAST(count(*) AS BIGINT) AS cnt
        |FROM part WHERE p_name LIKE '%widget%'
        |GROUP BY p_name ORDER BY file_name""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_name").contains("widget")) // Search.cpp:65
        .groupBy(col("p_name").as("file_name")) // Search.cpp:66-78 + shuffle
        .agg(count(lit(1)).as("cnt"))
        .orderBy("file_name") // MapReduceFramework.cpp:341
    },

    // P1 — substring predicate alone (filter pushed into the parquet scan).
    QueryDef.of("filter_contains",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE '%bolt%' ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_name").contains("bolt"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    },

    // P2 — projection + literal attachment (`(name, 1)`, Search.cpp:66-68).
    QueryDef.of("project_literal",
      """SELECT p_name, CAST(1 AS BIGINT) AS one FROM part ORDER BY p_name""".stripMargin) {
      (s, dir) =>
        Tables.part(s, dir)
          .select(col("p_name"), lit(1L).as("one"))
          .orderBy("p_name")
    },

    // M1 — flatMap multiplicity 0..n: one row per token of p_name.
    QueryDef.of("flatmap_explode",
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token
        |FROM part ORDER BY p_partkey, token""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("token"))
        .orderBy("p_partkey", "token")
    },

    // G1/R3 — group by key value + count (the client's reduce, Search.cpp:74).
    QueryDef.of("group_count",
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // O1 — global total sort (range-partitioned in Spark, scales out the
    // reference's single-vector std::sort).
    QueryDef.of("sort_global",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_name, c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_name", "c_custkey")
    },

    // O2 — concatenation-union of two inputs (UNION ALL semantics).
    QueryDef.of("union_all",
      """SELECT name FROM (
        |  SELECT c_name AS name FROM customer
        |  UNION ALL
        |  SELECT s_name AS name FROM supplier
        |) ORDER BY name""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select(col("c_name").as("name"))
        .unionAll(Tables.supplier(s, dir).select(col("s_name").as("name")))
        .orderBy("name")
    },

    // §2.9 companions to the concat-union: INTERSECT / EXCEPT with SQL
    // DISTINCT set semantics (Spark's Dataset.intersect/except match).
    // Both plan as distinct-aggregated joins (LeftSemi/LeftAnti) — partial
    // aggregation collapses each side BEFORE the shuffle, so at 100 TB the
    // shuffle carries distinct keys, not rows.
    QueryDef.of("intersect_distinct",
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  INTERSECT
        |  SELECT c_custkey AS custkey FROM customer WHERE c_nationkey < 10
        |) ORDER BY custkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
        .intersect(Tables.customer(s, dir)
          .filter(col("c_nationkey") < 10)
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey")
    },

    // same side pair as intersect_distinct, subtracted — the two results
    // partition the ordering customers, so both are guaranteed non-empty
    // and together certify complementary set semantics
    QueryDef.of("except_distinct",
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT
        |  SELECT c_custkey AS custkey FROM customer WHERE c_nationkey < 10
        |) ORDER BY custkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
        .except(Tables.customer(s, dir)
          .filter(col("c_nationkey") < 10)
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey")
    },

    // S3 — presentation expansion: each name repeated per its count
    // (`Search.cpp:113-117`), via explode(array_repeat(...)).
    QueryDef.of("repeat_rows",
      """SELECT n_nationkey, n_name FROM nation
        |JOIN (SELECT unnest(generate_series(1, 3)) AS i) s
        |  ON s.i <= (n_nationkey % 3) + 1
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          explode(array_repeat(col("n_name"), (col("n_nationkey") % 3 + 1).cast("int")))
            .as("n_name"))
        .orderBy("n_nationkey")
    },

    // S2 — the client's directory-listing scan (`Search.cpp:98-111`) feeding
    // the full Search pipeline: list the SF directory's entries (including
    // "." and ".." exactly as readdir yields them), search for "parquet",
    // count per name, sort. DuckDB has no directory source, but every sf
    // directory deterministically contains exactly the ten known tables
    // (TESTDATA.md / Tables.names) — so a VALUES oracle pins the full
    // result: each matching name once, "."/".." filtered by the search.
    QueryDef.of("dir_search",
      "SELECT file_name, CAST(1 AS BIGINT) AS cnt FROM (VALUES " +
        graft.sources.Tables.names.sorted
          .map(n => s"('$n.parquet')").mkString(", ") +
        ") t(file_name) ORDER BY file_name") { (s, dir) =>
      implicit val spark: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      val input = Tables.dirListing(s, Seq(dir))
        .select("file_name").as[String].map((_, "parquet"))
      graft.mr.MapReduce.searchPipeline(input).toDF("file_name", "cnt")
    },

    // The typed MapReduce API (Layer A) driving the same Search pipeline —
    // proves MapReduce.run/runAlgebraic against the DuckDB oracle.
    QueryDef.of("mr_search",
      """SELECT p_name AS file_name, CAST(count(*) AS BIGINT) AS cnt
        |FROM part WHERE p_name LIKE '%widget%'
        |GROUP BY p_name ORDER BY file_name""".stripMargin) { (s, dir) =>
      implicit val spark: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      val input = Tables.part(s, dir)
        .select(col("p_name"), lit("widget"))
        .as[(String, String)]
      graft.mr.MapReduce.searchPipeline(input).toDF("file_name", "cnt")
    }
  )
}
