package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** As-of join vs a plain-Scala reference: inclusive bound, key isolation,
  * null before any right row, randomized agreement. */
class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofJoin: latest right at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 25L, "l3"),
      (2L, 15L, "l4"), (3L, 5L, "l5"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 22L, 122.0),
      (2L, 10L, 210.0), (2L, 16L, 216.0))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      "l1" -> Some(100.0), // equal ts: inclusive
      "l2" -> Some(100.0), // 22 > 20 → older row
      "l3" -> Some(122.0),
      "l4" -> Some(210.0), // key 2 isolated from key 1
      "l5" -> None))       // no right row at-or-before
  }

  test("asofJoin agrees with a plain-Scala reference on randomized streams") {
    val rnd = new scala.util.Random(11)
    val lrows = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
    // unique (key, ts) on the right — the operator's caller contract
    val rrows = rnd.shuffle(
      (for (k <- 0L until 8L; ts <- 0L until 1000L) yield (k, ts)).toSeq)
      .take(400).map { case (k, ts) => (k, ts, k * 10000.0 + ts) }
    val got = AsOf.asofJoin(
        lrows.toDF("id", "k", "ts"), rrows.toDF("k", "ts", "v"),
        Seq("k"), "ts", Seq("v"))
      .select("id", "asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val byKey = rrows.groupBy(_._1)
    lrows.foreach { case (id, k, ts) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= ts).sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == want, s"left id=$id k=$k ts=$ts")
    }
  }
}
