package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpecBase {
  import spark.implicits._

  /** Plain-Scala classic Levenshtein — the reference twin for the engine's
    * native `levenshtein` (same DP recurrence DuckDB implements). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val rows = Seq(
    "red bolt", "red bolt", "red bolt", // support 3
    "rad bolt",                         // dist 1 from red bolt
    "xyz bolt",                         // dist 3 from red bolt
    "red ring",                         // other block entirely
    "ged ring").toDF("name")            // dist 1 from red ring

  private def pairs(maxDist: Int) =
    Fuzzy.blockedLevenshteinPairs(rows, "name",
      n => element_at(split(n, "\\s+"), -1), maxDist)

  test("pairs carry the exact classic edit distance and support counts") {
    val got = pairs(3).orderBy("name_a", "name_b")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    for ((a, b, d, na, nb) <- got) {
      assert(d == lev(a, b), s"($a,$b)")
      assert(na == rows.filter(col("name") === a).count())
      assert(nb == rows.filter(col("name") === b).count())
    }
    assert(got.contains(("rad bolt", "red bolt", 1L, 1L, 3L)))
    assert(got.contains(("red bolt", "xyz bolt", 3L, 3L, 1L)))
  }

  test("candidates never cross blocks, even within distance") {
    // "red bolt" vs "red ring" is dist 3 but lives in another block —
    // blocking is part of the operator's semantics (it buys the equi-join)
    val got = pairs(3).as[(String, String, Long, Long, Long)].collect()
    assert(!got.exists(p => p._1 == "red bolt" && p._2 == "red ring"))
    assert(got.contains(("ged ring", "red ring", 1L, 1L, 1L)))
  }

  test("one canonical orientation per pair; maxDist filters") {
    val got = pairs(1).as[(String, String, Long, Long, Long)].collect()
    assert(got.forall(p => p._1 < p._2))
    assert(got.map(p => (p._1, p._2)).toSet ==
      Set(("rad bolt", "red bolt"), ("ged ring", "red ring")))
    val keys = got.map(p => (p._1, p._2))
    assert(keys.distinct.length == keys.length)
  }

  test("clusters: fuzzy pairs + union-find resolve transitive chains to one canon (the fuzzy_clusters composition)") {
    // chain a–b–c where lev(a,c)=2 > 1: only transitivity links a to c.
    // ids by min row-id per name, canon = the cluster's min-id name —
    // exactly what the fuzzy_clusters query wires.
    val named = Seq(
      (10L, "bolt aa"), (20L, "bolt ab"), (30L, "bolt bb"), // aa–ab–bb chain;
      (40L, "ring zz")).toDF("id", "name")                  // lev(aa,bb)=2
    val ids = named.groupBy("name").agg(min("id").as("nid"))
    val prs = Fuzzy.blockedLevenshteinPairs(named, "name",
        n => element_at(split(n, "\\s+"), 1), maxDist = 1)
      .join(ids.select(col("name").as("name_a"), col("nid").as("doc_a")), "name_a")
      .join(ids.select(col("name").as("name_b"), col("nid").as("doc_b")), "name_b")
      .select("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(prs, loopParts = 1)
      .join(ids.select(col("nid").as("doc_id"), col("name")), "doc_id")
      .join(ids.select(col("nid").as("cluster"), col("name").as("canon")), "cluster")
      .select("name", "canon").as[(String, String)].collect().toSet
    // all three chain members resolve to "bolt aa" (min id 10) even though
    // lev(aa,bb)=2 > maxDist; the isolated name appears in no pair, hence
    // in no cluster row
    assert(got == Set(("bolt aa", "bolt aa"), ("bolt ab", "bolt aa"),
      ("bolt bb", "bolt aa")))
  }
}
