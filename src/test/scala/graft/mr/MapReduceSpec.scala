package graft.mr

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/**
 * Contract tests for the typed MapReduce API against the reference's
 * observable semantics (SURVEY.md §1.5, §3.3):
 *   - grouping is by key VALUE (`MapReduceFramework.cpp:186-193`),
 *   - intra-group value order is unspecified (`:183-197`) → results must be
 *     permutation-invariant,
 *   - map/reduce are flatMaps (0..n emits),
 *   - output is globally sorted ascending by K3 (`:341`).
 */
class MapReduceSpec extends SparkSpecBase {
  import spark.implicits._

  private val names = Seq("alpha.txt", "beta.log", "alpha.txt", "gamma.md",
    "alphabet.doc", "beta.log", "alpha.txt")
  private def searchInput(word: String) = names.map((_, word)).toDS()

  test("searchPipeline counts and sorts like the Search client") {
    val out = MapReduce.searchPipeline(searchInput("alpha"))(spark).collect()
    assert(out.toSeq == Seq(("alpha.txt", 3L), ("alphabet.doc", 1L)))
  }

  test("run ≡ runAlgebraic ≡ DataFrame groupBy.count on the Search pipeline") {
    val in = searchInput("a")
    val viaRun = MapReduce.run[String, String, String, Long, String, Long](
      in,
      (n, w) => if (n.contains(w)) Iterator.single((n, 1L)) else Iterator.empty,
      (k, vs) => Iterator.single((k, vs.size.toLong))
    ).collect().toSeq
    val viaAlg = MapReduce.searchPipeline(in)(spark).collect().toSeq
    val viaDf = in.toDF("name", "word")
      .filter(col("name").contains("a"))
      .groupBy("name").agg(count(lit(1)).as("cnt"))
      .orderBy("name")
      .as[(String, Long)].collect().toSeq
    assert(viaRun == viaAlg)
    assert(viaRun == viaDf)
  }

  test("output keys are globally sorted ascending (MapReduceFramework.cpp:341)") {
    val out = MapReduce.run[Int, Int, String, Int, String, Int](
      Seq((1, 10), (2, 20), (3, 30)).toDS(),
      (k, v) => Seq((s"k${v % 7}", v), (s"k${v % 5}", v)),
      (k, vs) => Iterator.single((k, vs.sum))
    ).collect().map(_._1).toSeq
    assert(out == out.sorted)
  }

  test("grouping is by key value, not identity (separately-built equal keys)") {
    // two rows whose keys are distinct String instances with equal value —
    // the reference deletes the duplicate key object and appends the value
    val in = Seq(("a", 1L), ("b", 2L)).toDS()
    val out = MapReduce.run[String, Long, String, Long, String, Long](
      in,
      // build a NEW key string per row that is value-equal across rows
      (_, v) => Iterator.single((new String("dup"), v)),
      (k, vs) => Iterator.single((k, vs.sum))
    ).collect().toSeq
    assert(out == Seq(("dup", 3L)))
  }

  test("result is invariant under input permutation (shuffle-order freedom)") {
    val base = (1 to 100).map(i => (s"f${i % 13}.txt", "f"))
    val a = MapReduce.searchPipeline(base.toDS())(spark).collect().toSeq
    val b = MapReduce.searchPipeline(scala.util.Random.shuffle(base).toDS())(spark)
      .collect().toSeq
    assert(a == b)
  }

  test("map multiplicity: 0, 1, n emits per input all flow through") {
    val out = MapReduce.run[Int, Int, Int, Int, Int, Int](
      Seq((0, 0), (1, 1), (3, 3)).toDS(),
      (k, _) => (1 to k).map(i => (k, i)), // 0, 1, 3 emits
      (k, vs) => Iterator.single((k, vs.size))
    ).collect().toSeq
    assert(out == Seq((1, 1), (3, 3)))
  }

  test("reduce multiplicity: a group may emit 0 or n rows") {
    val out = MapReduce.run[Int, Int, Int, Int, Int, Int](
      Seq((1, 1), (2, 2)).toDS(),
      (k, v) => Iterator.single((k, v)),
      (k, vs) => if (k == 1) Iterator.empty else (1 to 3).map(i => (k * 10 + i, i))
    ).collect().toSeq
    assert(out == Seq((21, 1), (22, 2), (23, 3)))
  }

  test("empty input → empty output") {
    val out = MapReduce.searchPipeline(Seq.empty[(String, String)].toDS())(spark)
    assert(out.collect().isEmpty)
  }

  test("count aggregator matches group sizes for random inputs") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(500)((s"k${rnd.nextInt(20)}", rnd.nextInt(1000)))
    val expected = data.groupBy(_._1).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = MapReduce.runAlgebraic[String, Int, String, Int, Long, Long](
      data.toDS(),
      (k, v) => Iterator.single((k, v)),
      MapReduce.countAgg[Int]
    ).collect().toSeq
    assert(got == expected)
  }
}
