package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpecBase {
  import spark.implicits._

  // heavily skewed fact: 5000 rows of key 1, a handful elsewhere
  private lazy val fact = ((1 to 5000).map(i => (1L, i.toLong)) ++
    Seq((2L, 10L), (3L, 20L), (3L, 30L))).toDF("k", "v")
  private lazy val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"), (4L, "unused"))
    .toDF("k", "name")

  test("saltedJoin ≡ plain inner join on skewed keys") {
    val plain = fact.join(dim, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Salt.saltedJoin(fact, dim, "k", buckets = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 5003)
  }

  test("salt spreads a hot key across buckets (no single-task key)") {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8L)).cast("int"))
    val spread = salted.filter(col("k") === 1L)
      .groupBy("_salt").count().collect()
    assert(spread.length == 8) // hot key present in every bucket
    assert(spread.map(_.getLong(1)).max < 5000) // and not concentrated
  }

  test("saltedJoinAgg matches unsalted join + aggregate") {
    val expected = fact.join(dim, "k").groupBy("name")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Salt.saltedJoinAgg(fact, dim, "k", Seq("name"),
        Seq(sum("v").as("s"), count(lit(1)).as("n")), buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }
}
