package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.CosineSimilarity

/**
 * Session extensions registering the engine's native expressions with the
 * SQL function registry, so `spark.sql("... cosine_sim(a, b) ...")` works
 * next to the Column API. Enable with
 * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
 * (as `Verify`/`Bench` and the test harness do).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim expects exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
