package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CosineSimilarity, DocFingerprint, LangId,
  MinhashFromFeatures, ShingleHashes, SimhashFromHashes}

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
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "shingle_hashes expects (text, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes: k must be an integer literal, got $other")
        }
        ShingleHashes(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "lang_id expects exactly 1 argument")
        LangId(children.head, graft.functions.TextFunctions.langMarkers)
      }))
    ext.injectFunction((
      FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[DocFingerprint].getName, "doc_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "doc_fingerprint expects exactly 1 argument")
        DocFingerprint(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_from_hashes"),
      new ExpressionInfo(classOf[SimhashFromHashes].getName, "simhash_from_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash_from_hashes expects exactly 1 argument")
        SimhashFromHashes(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_from_features"),
      new ExpressionInfo(classOf[MinhashFromFeatures].getName, "minhash_from_features"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_from_features expects (features, numHashes)")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_from_features: numHashes must be an integer literal, got $other")
        }
        MinhashFromFeatures(children.head, n)
      }))
  }
}
