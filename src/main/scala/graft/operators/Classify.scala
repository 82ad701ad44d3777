package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * TRAINED multinomial naive-Bayes text classifier — the classic
 * quality/domain classifier of large-scale curation (the GPT-3/CCNet
 * linear-classifier filtering step, in its simplest trainable form):
 * fit per-class token statistics on a TRAIN split, score every TEST
 * document, predict the argmax class. Unlike `lang_id_dist`'s fixed
 * heuristic, this LEARNS from the corpus — the engine's first
 * train-then-apply operator.
 *
 * Model (Laplace-smoothed multinomial NB over whitespace tokens):
 *
 *   score(d, c) = ln(n_c / N) + Σ_t k_t(d) · ln((c_tc + 1)/(n_c^tok + V))
 *
 * with n_c = train docs of class c, N = train docs, c_tc = class c's
 * count of token t, n_c^tok = class c's total tokens, V = train
 * vocabulary size. Out-of-vocabulary test tokens are DROPPED (the
 * standard convention: the model is defined over the train vocabulary);
 * in-vocabulary tokens unseen for a class take the Laplace mass.
 *
 * Determinism: every count is an exact integer; each token's class
 * likelihood is ONE fixed-shape double expression; the per-(doc, class)
 * sum folds k·ln(p) in TOKEN ORDER (sort_array over the doc's
 * in-vocabulary token structs — bounded by the doc's own length);
 * argmax = min(struct(−score, class)) — negation of a finite double is
 * exact, so this is precisely (score DESC, class ASC), a total order
 * the oracle replays with row_number. A document with zero
 * in-vocabulary tokens is scored by priors alone (empty fold → 0).
 *
 * Scale shape: tokenization is one scan per split; the model is three
 * partial aggregates (per-class doc counts, per-(token, class) counts,
 * per-class token totals — all map-side combinable); scoring joins test
 * tokens to the model on the TOKEN key (shuffle join — the model is
 * |V|·C rows; for a web-scale vocabulary, feature-hash tokens into a
 * fixed bucket space first, exactly as [[Dsir]] does) and fans out by
 * C classes via one broadcast of the C-row class frame. No windows on
 * data-sized frames (the argmax is a partial-agg min(struct)); no
 * driver-side state at all.
 */
object Classify {

  /** Train on `isTrain` rows, predict for the rest:
    * (doc_id, pred, score) — `labelCol` must be present on train rows.
    * `docs` needs (doc_id, labelCol, text). */
  def multinomialNb(docs: DataFrame, labelCol: String,
      isTrain: Column): DataFrame = {
    val base = docs.select(col("doc_id"), col(labelCol).as("label"),
      col("text"), isTrain.as("tr"))
    val toks = Caches.persistTracked(base
      .select(col("doc_id"), col("label"), col("tr"),
        explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "label", "tr", "t")
      .agg(count(lit(1)).as("k")))
    val trainToks = toks.filter(col("tr"))
    val testToks = toks.filter(!col("tr")).select("doc_id", "t", "k")
    // slim per-doc frame behind ndc/nTrain/testDocs (r15): each of the
    // three previously re-evaluated `base` — a full input scan PLUS the
    // caller's label expression (for the wired quality_classifier row, a
    // regex-heavy quality score) — per reference. |docs| rows of three
    // narrow columns, one materialization.
    val meta = Caches.persistTracked(base.select("doc_id", "label", "tr"))

    // model: C-row class frame (priors + token totals + the two corpus
    // constants), |V|·C-row likelihood table, |V|-row vocabulary
    val ndc = meta.filter(col("tr")).groupBy("label")
      .agg(count(lit(1)).as("ndc"))
    val nTrain = meta.filter(col("tr")).agg(count(lit(1)).as("n"))
    // checkpointTracked, not a bare plan (r15): tc feeds THREE subtrees
    // (ncl, the in-vocabulary semi-join's distinct, the likelihood join)
    // — unmaterialized, each re-aggregated the token cache per reference
    val tc = Caches.checkpointTracked(
      trainToks.groupBy("label", "t").agg(sum("k").as("c")))
    val ncl = tc.groupBy("label").agg(sum("c").as("ncl"))
    val vocabN = trainToks.select("t").distinct().agg(count(lit(1)).as("v"))
    val cls = ndc.join(ncl, "label")
      .crossJoin(broadcast(nTrain)).crossJoin(broadcast(vocabN))

    // score: in-vocab test tokens × classes, per-row Laplace likelihood,
    // token-ordered fold per (doc, class)
    val inVocab = testToks.join(tc.select("t").distinct(), Seq("t"), "left_semi")
    val rows = inVocab.crossJoin(broadcast(cls))
      .join(tc, Seq("t", "label"), "left")
      .select(col("doc_id"), col("label"),
        col("t"), col("k"),
        ((coalesce(col("c"), lit(0L)) + 1L).cast("double") /
          (col("ncl") + col("v")).cast("double")).as("p"))
    // ieeeLn, not Spark's log(): the oracle's ln is libm — see Ieee754Ln
    val folds = rows.groupBy("doc_id", "label")
      .agg(aggregate(
        sort_array(collect_list(struct(col("t"), col("k"), col("p")))),
        lit(0.0),
        (acc, s) => acc + s.getField("k").cast("double") *
          TextFunctions.ieeeLn(s.getField("p")))
        .as("ll"))

    // every (test doc, class) cell exists even with zero in-vocab tokens
    val testDocs = meta.filter(!col("tr")).select("doc_id")
    val scored = testDocs.crossJoin(broadcast(cls))
      .join(folds, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (TextFunctions.ieeeLn(col("ndc").cast("double") / col("n").cast("double")) +
          coalesce(col("ll"), lit(0.0))).as("score"))
    scored.groupBy("doc_id")
      .agg(min(struct((-col("score")).as("ns"), col("label"))).as("m"))
      .select(col("doc_id"), col("m.label").as("pred"),
        (-col("m.ns")).as("score"))
  }
}
