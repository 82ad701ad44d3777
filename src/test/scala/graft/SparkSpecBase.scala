package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (getOrCreate → one session per
  * forked test JVM). Shuffle partitions kept small so 6k-row fixtures don't
  * pay 200-task overheads. */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Smoke-scale driver testdata (read-only). */
  val sf0001 = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session shared across suites in the same JVM — do not stop it
    super.afterAll()
  }
}
