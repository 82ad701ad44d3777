package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/**
 * Bloom-prefiltered semi join: (1) the build/probe bit-math twins agree —
 * every inserted key passes the Column probe (no false negatives, the
 * property the final exactness rests on); (2) the end result EQUALS the
 * plain semi join on data with matching and non-matching keys; (3) the
 * prefilter actually prunes (false-positive rate is small, the property
 * that makes it worth running before a 100 TB shuffle).
 */
class BloomSpec extends SparkSpecBase {
  import spark.implicits._

  private val numBits = 1 << 16
  private val numHashes = 4
  private val M = 2147483647L

  test("no false negatives: every inserted key passes the Column probe") {
    val keys = (0L until 2000L).map(_ * 7919L + 13L)
    val bits = Bloom.keyBitmap(keys.toDF("k"), "k", numBits, numHashes)
    val pass = keys.toDF("k")
      .filter(Bloom.mightContain(bits, numBits, numHashes, pmod(col("k"), lit(M))))
      .count()
    assert(pass == keys.size.toLong)
  }

  test("false-positive rate on non-members is small") {
    val members = (0L until 1000L).map(_ * 2L) // evens
    val bits = Bloom.keyBitmap(members.toDF("k"), "k", numBits, numHashes)
    val nonMembers = (0L until 10000L).map(_ * 2L + 1L) // odds, disjoint
    val fp = nonMembers.toDF("k")
      .filter(Bloom.mightContain(bits, numBits, numHashes, pmod(col("k"), lit(M))))
      .count()
    // 1000 keys * 4 hashes in 65536 bits -> theoretical fpr ~ (1-e^-0.061)^4
    // ~ 1.2e-5; allow two orders of slack for double-hashing correlation
    assert(fp.toDouble / nonMembers.size < 0.01, s"fp=$fp")
  }

  test("semiJoin equals the plain left-semi join") {
    val fact = Seq.tabulate(5000)(i => (i.toLong % 700L, s"row$i")).toDF("fk", "payload")
    val dim = (0L until 700L by 3L).toDF("dk") // every third key matches
    val got = Bloom.semiJoin(fact, "fk", dim, "dk")
      .orderBy("fk", "payload").as[(Long, String)].collect().toSeq
    val dimKeys = dim.select(col("dk"))
    val want = fact.join(dimKeys, fact("fk") === dimKeys("dk"), "left_semi")
      .orderBy("fk", "payload").as[(Long, String)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
