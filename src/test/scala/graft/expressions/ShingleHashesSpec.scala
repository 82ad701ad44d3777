package graft.expressions

import graft.SparkSpecBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Native ShingleHashes vs the composable HOF reference — bit equality,
  * including the whitespace edge cases Spark's trim/split produce. */
class ShingleHashesSpec extends SparkSpecBase {
  import spark.implicits._

  private def hofHashes(k: Int) =
    transform(TextFunctions.shingles(col("t"), k), s => xxhash64(s))

  private val edgeCases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c", "single", "", "   ",
    "\t", "\ta b", "a b\t", "a\t\tb", " \t mixed \t ",
    "  padded   with   spaces  ",
    "exactly three toks", "one two", "ümlaut ünïcode tökens 中文 字符")

  test("native shingle_hashes ≡ transform(shingles, xxhash64) on edge cases") {
    for (k <- Seq(1, 2, 3, 5)) {
      val rows = edgeCases.toDF("t")
        .select(TextFunctions.shingleHashes(col("t"), k).as("native"),
          hofHashes(k).as("hof"))
        .collect()
      edgeCases.zip(rows).foreach { case (s, r) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"k=$k text=${s.replace("\t", "\\t").take(40)}")
      }
    }
  }

  test("native shingle_hashes ≡ HOF on randomized text incl. whitespace runs") {
    val rnd = new scala.util.Random(17)
    val alphabet = "abcXYZ019 .,!\t   " // spaces + tabs, runs likely
    val randoms = (1 to 60).map { _ =>
      val n = rnd.nextInt(150)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val rows = randoms.toDF("t")
      .select(TextFunctions.shingleHashes(col("t"), 3).as("native"),
        hofHashes(3).as("hof"))
      .collect()
    randoms.zip(rows).foreach { case (s, r) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s.replace("\t", "\\t").take(50))
    }
  }

  test("portable mode matches the plain-Scala poly31|poly37 fold (incl. unicode)") {
    val M = 2147483647L
    def poly(s: String, mult: Long): Long = {
      var h = 17L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * mult + cp) % M
        i += Character.charCount(cp)
      }
      h
    }
    def refPortable(s: String, k: Int): Seq[Long] = {
      val t = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+", -1)
      val sh = if (toks.length <= k) Seq(toks.mkString(" "))
               else toks.sliding(k).map(_.mkString(" ")).toSeq
      sh.map(x => poly(x, 31L) | (poly(x, 37L) << 31))
    }
    val cases = edgeCases :+ "日本語 テキスト の 文書 🎉 emoji beyond bmp"
    for (k <- Seq(1, 3)) {
      val rows = cases.toDF("t")
        .select(TextFunctions.shingleHashes(col("t"), k, portable = true))
        .collect()
      cases.zip(rows).foreach { case (s, r) =>
        assert(r.getSeq[Long](0) == refPortable(s, k),
          s"k=$k ${s.replace("\t", "\\t").take(40)}")
      }
    }
  }

  test("null text yields null; SQL registration works") {
    val r = Seq[Option[String]](None, Some("a b c d"))
      .toDF("t").select(TextFunctions.shingleHashes(col("t"), 3)).collect()
    assert(r(0).isNullAt(0))
    assert(!r(1).isNullAt(0))
    val viaSql = spark.sql(
      "SELECT shingle_hashes('one two three four', 3) AS h").collect()
    assert(viaSql(0).getSeq[Long](0).length == 2)
  }
}
