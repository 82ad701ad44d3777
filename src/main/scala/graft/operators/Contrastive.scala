package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/**
 * Contrastive training-pair generation, ICT-style (Lee et al. 2019's
 * Inverse Cloze Task for dense-retriever pretraining; negatives per
 * anchor as in DPR's sampled-negative setup): each document is split
 * into an anchor half and a passage half — (anchor, own passage) is a
 * POSITIVE pair, (anchor, another doc's passage) a sampled NEGATIVE.
 * This manufactures supervision from raw text — the standard move when
 * a corpus has no labeled pairs at all.
 *
 * Scale shape — the part that matters at 100 TB:
 *  - NO global sort, NO single-task window, NO rank materialization:
 *    negative partners come from pure per-row MODULAR ARITHMETIC over
 *    the dense id domain (partner = (id + 1 + mix(id, j) mod (N−1))
 *    mod N — never equal to id), so pair generation is embarrassingly
 *    parallel and the only shuffle is the equi-join fetching partner
 *    passages (corpus-sized, hash-partitioned, no skew by construction:
 *    the mix spreads partners uniformly).
 *  - The mix is engine-portable integer arithmetic (products bounded
 *    far under 2^63 by a pre-reduction mod — DuckDB errors on BIGINT
 *    overflow where the JVM would wrap silently), so the oracle replays
 *    pair selection exactly.
 *
 * Caller contract: `docs(idCol)` is DENSE 0..N−1 over the rows that
 * survive the ≥ `minTokens` filter (re-rank upstream if curation
 * dropped rows — [[SequencePack]]'s id-compaction pattern). Output:
 * (doc_a, doc_b, label, nix, text_a, text_b), one positive (nix=0) and
 * `negatives` sampled negatives (nix=1..k) per anchor; total order on
 * (doc_a, nix).
 */
object Contrastive {

  def ictPairs(docs: DataFrame, negatives: Int = 2,
      minTokens: Int = 4): DataFrame = {
    val half = ceil(size(col("ts")) / lit(2.0)).cast("long")
    val halves = Caches.persistTracked(docs
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= minTokens)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("ts"), lit(1), half.cast("int"))).as("text_a"),
        concat_ws(" ", slice(col("ts"), (half + 1L).cast("int"),
          (size(col("ts")) - half).cast("int"))).as("text_b")))
    val n = halves.agg(count(lit(1)).as("n"))
    val pos = halves.select(col("doc_id").as("doc_a"),
      col("doc_id").as("doc_b"), lit(1L).as("label"), lit(0L).as("nix"),
      col("text_a"), col("text_b"))
    // partner id: portable mix, pre-reduced so every product < 2^52
    val mix = ((col("doc_a") * lit(1000003L) + col("nix") * lit(10007L))
      % lit(1048573L)) * lit(2654435761L)
    val neg = halves
      .select(col("doc_id").as("doc_a"), col("text_a"),
        explode(sequence(lit(1L), lit(negatives.toLong))).as("nix"))
      .crossJoin(broadcast(n))
      // a 1-doc corpus has no valid negative; the filter also keeps the
      // mod-(n−1) divisor from hitting zero
      .filter(col("n") > 1L)
      .select(col("doc_a"), col("text_a"), col("nix"),
        ((col("doc_a") + lit(1L) + mix % (col("n") - lit(1L))) % col("n"))
          .as("doc_b"))
      .join(halves.select(col("doc_id").as("doc_b"),
        col("text_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), lit(0L).as("label"), col("nix"),
        col("text_a"), col("text_b"))
    pos.unionAll(neg).orderBy("doc_a", "nix")
  }
}
