package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Decontaminate, Dedup, Multimodal, SequencePack, Similarity}
import graft.functions.TextFunctions

/**
 * Extension tier B — the LLM-training-data-pipeline surface over the
 * `documents` and `embeddings` tables: deduplication (exact, fingerprint,
 * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
 * search (brute-force + LSH ANN), text analysis (token stats, quality,
 * language-ID, fingerprinting) and multimodal binary-column plumbing.
 *
 * Oracle policy: every DuckDB oracle mirrors the Spark arithmetic
 * operation-for-operation (same fold order, same casts, same rounding) so
 * double results are bit-identical, not merely close. Near-dup queries get
 * exact oracles through clean separation in the test corpus: planted
 * near-duplicates sit at Jaccard >= 0.9 while all other pairs sit below
 * 0.3, so any reasonable detector threshold (0.5) must return exactly the
 * true-Jaccard pair set, which DuckDB computes exactly. Approximate
 * operators whose output is NOT deterministically characterizable
 * (LSH ANN at low-similarity operating points) are wired rows-only.
 */
object LlmQueries {

  private val stopwordsSqlList: String =
    TextFunctions.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared DuckDB CTE: tokenization + word-3-shingle sets per document,
    * mirroring TextFunctions.tokens/shingles. Whitespace is spelled as the
    * explicit class `[ \t\n\x0B\f\r]+` in every oracle here because Java's
    * `\s` (the Spark-side tokenizer) includes vertical tab U+000B while
    * DuckDB/RE2's `\s` does not — the explicit class means the same thing
    * in both engines. (Both engines' `trim` strips ' ' only.) */
  private val shingleCte: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
      |         ELSE list_transform(generate_series(1, len(ts) - 2),
      |                             i -> array_to_string(ts[i:i+2], ' ')) END) AS s
      |  FROM toks
      |), ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS n_a, b.n AS n_b,
      |         CAST(count(*) AS BIGINT) AS i
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4
      |)""".stripMargin

  /** Shared curation CTE chain — quality filter (>= 0.5, bit-mirrored
    * weighted sum) → exact-dedup survivors (min doc_id per text, or per
    * NORMALIZED text — lowercased, whitespace-collapsed, the
    * `dedup_exact_norm` key — when `normDedup`) → STRICT
    * decontamination (drop benchmark members = every 7th doc_id and
    * anything sharing a 3-shingle with them) → deterministic weighted mix
    * (25% src0 / 50% src1 / 0% src2) — ending in a `mix` CTE carrying
    * doc_id/source/lang/text. Oracle prefix for `curation_pipeline`,
    * `curation_pipeline_norm` and `training_export`; every stage's
    * arithmetic is individually oracle-certified by its own row. */
  private def curationCte(normDedup: Boolean): String =
    curationCteBase.replace("GROUP BY text",
      if (normDedup)
        "GROUP BY lower(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))"
      else "GROUP BY text")

  /** [[curationCteBase]] with the scalar-quality gate swapped for the
    * gopher_rules conjunction (same stage surgery as [[curationCte]]'s
    * dedup-key swap; the unused `scored` CTE inlines away). The empty-text
    * edge differs in representation (engine n_words = 0, oracle
    * len(['']) = 1) but both fail the word-count rule, so the FILTER
    * composes identically on any corpus. */
  private def curationCteGopher: String =
    curationCteBase.replace(
      "SELECT doc_id, source, lang, text FROM scored WHERE quality >= 0.5",
      """SELECT doc_id, source, lang, text FROM (
        |    SELECT doc_id, source, lang, text,
        |      CAST(len(ts) AS BIGINT) AS nw,
        |      CAST(coalesce(list_sum(list_transform(ts, t -> length(t))), 0) AS BIGINT) AS sl,
        |      CAST(len(list_filter(ts, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS na,
        |      CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS BIGINT) AS nsw,
          |      CAST(len(regexp_extract_all(text, '#+|\.\.\.')) AS BIGINT) AS nsym
          |    FROM base)
          |  WHERE nw >= 10 AND nw <= 90 AND 3 * nw <= sl AND sl <= 10 * nw
          |    AND 5 * na >= 4 * nw AND 10 * nsym <= nw AND nsw >= 2""".stripMargin)

  private val curationCteBase: String =
    """WITH base AS (
        |  SELECT doc_id, source, lang, text,
        |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, source, lang, text, ts,
        |    least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ts) END AS DOUBLE) / 50.0, 1.0) * 0.3
        |    + least((CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
        |             ELSE CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS DOUBLE)
          |                  / CAST(len(ts) AS DOUBLE) END) * 5.0, 1.0) * 0.3
          |    + (CASE WHEN (CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
          |                  ELSE CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
          |                       / CAST(len(ts) AS DOUBLE) END) BETWEEN 3.0 AND 10.0
          |            THEN 1.0 ELSE 0.5 END) * 0.2
          |    + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
          |        ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
          |             / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.2 AS quality
          |  FROM base
          |), q AS (
          |  SELECT doc_id, source, lang, text FROM scored WHERE quality >= 0.5
          |), keep AS (
          |  SELECT min(doc_id) AS doc_id FROM q GROUP BY text
          |), dd AS (
          |  SELECT q.* FROM q JOIN keep ON q.doc_id = keep.doc_id
          |), sh AS (
          |  SELECT doc_id, list_distinct(
          |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
          |         ELSE list_transform(generate_series(1, len(ts) - 2),
          |                             i -> array_to_string(ts[i:i+2], ' ')) END) AS s
          |  FROM base
          |), ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
          |ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 7 = 0),
          |cont AS (
          |  SELECT DISTINCT e.doc_id FROM ex e JOIN ev ON e.g = ev.g
          |  WHERE e.doc_id % 7 <> 0
          |), clean AS (
          |  SELECT * FROM dd
          |  WHERE doc_id % 7 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
          |), fp AS (
          |  SELECT doc_id, source, lang, text,
          |    CASE WHEN length(trim(text)) = 0 THEN 0
          |    ELSE list_reduce(
          |      list_prepend(CAST(0 AS BIGINT), list_transform(
          |        string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
          |        t -> list_reduce(
          |               list_prepend(CAST(17 AS BIGINT), list_transform(
          |                 generate_series(1, length(t)),
          |                 i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
          |               (h, c) -> (h * 31 + c) % 2147483647))),
          |      (h, th) -> (h * 1000003 + th) % 2147483647)
          |    END AS fp
          |  FROM clean
          |)
          |, mix AS (
          |  SELECT doc_id, source, lang, text FROM fp
          |  WHERE fp % 10000 < CASE source WHEN 'src0' THEN 2500
          |                                 WHEN 'src1' THEN 5000
          |                                 WHEN 'src2' THEN 0
          |                                 ELSE 10000 END
          |)""".stripMargin

  /** The curation pipeline's intermediate frames, one per stage —
    * `curation_pipeline`/`training_export` consume the final `mixed`;
    * `curation_funnel` counts every stage. */
  private final case class CurationStages(
      docs: org.apache.spark.sql.DataFrame,
      quality: org.apache.spark.sql.DataFrame,
      deduped: org.apache.spark.sql.DataFrame,
      clean: org.apache.spark.sql.DataFrame,
      mixed: org.apache.spark.sql.DataFrame)

  /** Spark side of [[curationCte]]: the curated, mixed corpus with all
    * document columns — shared by `curation_pipeline` (projects ids),
    * `training_export` (feeds SequencePack), and `curation_funnel`
    * (stage counts). */
  private def curationStages(
      s: org.apache.spark.sql.SparkSession, dir: String,
      normDedup: Boolean = false, gopherPre: Boolean = false): CurationStages = {
    import graft.operators.CorpusMix
    val docs = Tables.documents(s, dir)
    // gopherPre swaps the scalar quality gate for the gopher_rules
    // conjunction — same shared-builder discipline as normDedup
    val q =
      if (gopherPre)
        docs.join(graft.operators.TextProfile.gopherRules(docs)
            .filter(col("pass") === 1L).select("doc_id"),
          Seq("doc_id"), "left_semi")
      else docs
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
        .drop("quality")
    // normDedup swaps the survivor key for Dedup.exactNormalized's
    // normalized text (lowercase + whitespace-collapse — the C4-style
    // soft-exact tier), one boolean through the shared builder so the
    // _norm row can never drift from the certified pipeline
    val dedupKey =
      if (normDedup) lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      else col("text")
    val keepIds = q.groupBy(dedupKey.as("k"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val deduped = q.join(keepIds, Seq("doc_id"), "left_semi")
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val train = deduped.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val cleanIds = Decontaminate.overlapStats(train, evalDocs)
      .filter(col("n_overlap") === 0).select("doc_id")
    val clean = train.join(cleanIds, Seq("doc_id"), "left_semi")
    val mixed = CorpusMix.sampleByStratum(clean, "source",
      Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.0))
    CurationStages(docs, q, deduped, clean, mixed)
  }

  private def curatedDocs(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    curationStages(s, dir).mixed

  /**
   * Oracle for the SCALE-point SimHash query: recomputes the ENTIRE
   * signature pipeline in DuckDB — word 3-shingles (non-distinct: votes are
   * multiplicity-weighted), the engine-portable 62-bit shingle hash
   * (`poly31 | poly37 << 31`, mirroring ShingleHashes portable=true
   * op-for-op), per-bit ±1 votes, sign packing, then the exact
   * hamming <= 3 pair set via bit_count(xor). Because the oracle computes
   * the same signatures bit-for-bit, NO corpus-separation argument is
   * needed; and because hamming 3 < 4 bands, banding recall is structural
   * (pigeonhole), so the Spark side finds exactly this set.
   */
  /** The portable-SimHash signature CTE prefix shared by
    * [[simhashScaleOracle]] and the fuzzy-decontamination oracle: word
    * 3-shingles (non-distinct — votes are multiplicity-weighted), the
    * engine-portable 62-bit shingle hash (`poly31 | poly37 << 31`,
    * mirroring ShingleHashes portable=true op-for-op), per-bit ±1
    * votes, sign packing → `sig(doc_id, sh62)`. */
  private val portableSimhashCte: String = {
    def fold(mult: Int) =
      s"""list_reduce(list_prepend(CAST(17 AS BIGINT),
         |      list_transform(generate_series(1, length(t)),
         |                     i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
         |      (h, c) -> (h * $mult + c) % 2147483647)""".stripMargin
    val bitTerms = (0 until 62).map { b =>
      s"(CASE WHEN list_sum(list_transform(hl, h -> CASE WHEN ((h >> $b) & 1) = 1" +
        s" THEN 1 ELSE -1 END)) > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" |\n    ") // operator at line END: stripMargin eats leading '|'
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS ts FROM documents
       |), shl AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
       |         ELSE list_transform(generate_series(1, len(ts) - 2),
       |                             i -> array_to_string(ts[i:i+2], ' ')) END AS s
       |  FROM toks
       |), hs AS (
       |  SELECT doc_id, list_transform(s, t ->
       |    ${fold(31)}
       |    | (${fold(37)} << 31)) AS hl
       |  FROM shl
       |), sig AS (
       |  SELECT doc_id, ($bitTerms) AS sh62 FROM hs
       |)""".stripMargin
  }

  /** Oracle for `dedup_phash`: recomputes the WHOLE blockhash pipeline in
    * DuckDB — 64 integer-boundary byte-span sums over the payload bytes
    * (ASCII text ⇒ byte = character code, the multimodal_decode
    * contract; `WHERE text IS NOT NULL` mirrors the operator dropping
    * null payloads), strictly-greater-than-mean bits, four 16-bit band
    * values (never a 64-bit pack — DuckDB's BIGINT `<<` cannot reach bit
    * 63), then the exact hamming ≤ 3 pair set via per-band
    * bit_count(xor). Signatures recomputed op-for-op ⇒ exact on ANY
    * corpus (no separation assumption); hamming 3 < 4 bands ⇒ the Spark
    * side's banding recall is structural (pigeonhole), so it finds
    * exactly this set. */
  /** Shared blockhash CTE prefix: signatures `sig(doc_id, b0..b3)` and
    * the exact hamming ≤ 3 pair set `ppr(doc_a, doc_b, hamming)`. */
  private val phashCte: String = {
    val blockSums =
      """list_transform(generate_series(0, 63), b ->
        |      list_sum(list_prepend(CAST(0 AS BIGINT), list_transform(
        |        generate_series(b * length(text) // 64 + 1,
        |                        (b + 1) * length(text) // 64),
        |        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)))))""".stripMargin
    def band(j: Int) = (0 until 16).map { k =>
      val b = j * 16 + k
      s"(CASE WHEN bs[${b + 1}] * 64 > tot THEN (CAST(1 AS BIGINT) << $k)" +
        " ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" |\n    ") // operator at line END: stripMargin eats leading '|'
    s"""WITH bl AS (
       |  SELECT doc_id, $blockSums AS bs
       |  FROM documents WHERE text IS NOT NULL
       |), tt AS (
       |  SELECT doc_id, bs,
       |    CAST(list_sum(list_prepend(CAST(0 AS BIGINT), bs)) AS BIGINT) AS tot
       |  FROM bl
       |), sig AS (
       |  SELECT doc_id, (${band(0)}) AS b0, (${band(1)}) AS b1,
       |    (${band(2)}) AS b2, (${band(3)}) AS b3 FROM tt
       |), ppr AS (
       |  SELECT * FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |      CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
       |         + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
       |        AS INTEGER) AS hamming
       |    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  ) WHERE hamming <= 3
       |)""".stripMargin
  }

  private val phashOracle: String =
    phashCte +
      """
        |SELECT doc_a, doc_b, hamming FROM ppr
        |ORDER BY doc_a, doc_b""".stripMargin

  /** Oracle for `dedup_phash_survivors`: the blockhash pair set through
    * the SAME recursive-reachability components + min-id-keeper CTE the
    * batch survivors rows certify — content-dedup cluster resolution over
    * the multimodal payload family, exact end to end (signatures
    * op-for-op, components a full fixpoint). */
  private val phashSurvivorsOracle: String =
    phashCte +
      """,
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS d FROM ppr
        |  UNION ALL SELECT doc_b, doc_a FROM ppr
        |),
        |reach AS (
        |  WITH RECURSIVE r(src, node) AS (
        |    SELECT DISTINCT s, s FROM edges
        |    UNION
        |    SELECT r.src, e.d FROM r JOIN edges e ON r.node = e.s
        |  ) SELECT src, min(node) AS cluster FROM r GROUP BY src
        |)
        |SELECT doc_id FROM documents
        |WHERE text IS NOT NULL
        |  AND doc_id NOT IN (SELECT src FROM reach WHERE cluster <> src)
        |ORDER BY doc_id""".stripMargin

  private val simhashScaleOracle: String =
    portableSimhashCte +
      """
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sh62, b.sh62)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh62, b.sh62)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin

  /** Oracle for `tfidf_topk`: recomputes the portable 62-bit shingle
    * hashes (same folds as [[simhashScaleOracle]]) so the posting-join
    * keys and the sorted-fold addition order match the engine exactly;
    * tf/df/N are integer aggregates, weights/norms/dots mirror the Spark
    * arithmetic op-for-op (ln, sorted list_reduce folds, sqrt, one
    * division). */
  private val tfidfOracle: String = {
    def fold(mult: Int) =
      s"""list_reduce(list_prepend(CAST(17 AS BIGINT),
         |      list_transform(generate_series(1, length(t)),
         |                     i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
         |      (h, c) -> (h * $mult + c) % 2147483647)""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS ts FROM documents
       |), shl AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
       |         ELSE list_transform(generate_series(1, len(ts) - 2),
       |                             i -> array_to_string(ts[i:i+2], ' ')) END AS s
       |  FROM toks
       |), hx AS (
       |  SELECT doc_id, unnest(list_transform(s, t ->
       |    ${fold(31)}
       |    | (${fold(37)} << 31))) AS h
       |  FROM shl
       |), tf AS (
       |  SELECT doc_id, h, CAST(count(*) AS BIGINT) AS tf FROM hx GROUP BY 1, 2
       |), dfx AS (
       |  SELECT h, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY h
       |  HAVING count(*) <= 1000
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |w AS (
       |  SELECT doc_id, h,
       |    CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS w
       |  FROM tf JOIN dfx USING (h) CROSS JOIN nn
       |), norms AS (
       |  SELECT doc_id, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_sort(list(struct_pack(h := h, w := w))),
       |                   x -> x.w * x.w)), (a, x) -> a + x)) AS nrm
       |  FROM w GROUP BY doc_id
       |), dots AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_sort(list(struct_pack(h := a.h, p := a.w * b.w))),
       |                     x -> x.p)), (acc, x) -> acc + x) AS dot
       |  FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, dot / (na.nrm * nb.nrm) AS cosine
       |FROM dots JOIN norms na ON dots.doc_a = na.doc_id
       |          JOIN norms nb ON dots.doc_b = nb.doc_id
       |WHERE na.nrm > 0.0 AND nb.nrm > 0.0
       |ORDER BY cosine DESC, doc_a, doc_b LIMIT 100""".stripMargin
  }

  /** Shared oracle for both survivors queries (exact-engine and composed
    * scale-engine detection — on the separated Verify corpora their pair
    * sets are provably equal, so one oracle certifies both): resolve
    * components with a recursive reachability CTE, keep min-id per
    * component. */
  /** Shared prefix: exact near-dup pairs at 0.5 resolved to components
    * (`reach(src, cluster)`) — the union-find the engine runs as
    * pointer jumping, replayed as a recursive reachability CTE. */
  private val dupClustersCte: String =
    shingleCte +
      """,
        |pr AS (
        |  SELECT doc_a, doc_b FROM p
        |  WHERE CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE) >= 0.5
        |),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS d FROM pr
        |  UNION ALL SELECT doc_b, doc_a FROM pr
        |),
        |reach AS (
        |  WITH RECURSIVE r(src, node) AS (
        |    SELECT DISTINCT s, s FROM edges
        |    UNION
        |    SELECT r.src, e.d FROM r JOIN edges e ON r.node = e.s
        |  ) SELECT src, min(node) AS cluster FROM r GROUP BY src
        |)""".stripMargin

  private val survivorsOracle: String =
    dupClustersCte +
      """
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT src FROM reach WHERE cluster <> src)
        |ORDER BY doc_id""".stripMargin

  /** Oracle for `dedup_semantic`: the WHOLE SemDeDup algorithm replayed
    * op-for-op — NO separation assumption. Assignment is kmeans_assign's
    * certified fold (left-to-right Σ(x−c)² with float→double widening,
    * (dist, cell) argmin); within-cell pair cosines and member→centroid
    * cosines via list_cosine_similarity on DOUBLE[] casts (certified
    * bit-equal to the native CosineSimilarity by the ann rows); groups
    * via the survivorsOracle recursive-reachability CTE; keeper = min
    * under the (ccos, vec_id) total order. The 0.4 threshold is spelled
    * CAST(0.4 AS DOUBLE) — a bare 0.4 folds as DECIMAL in DuckDB (the
    * pageRank literal pitfall) and would compare differently at the
    * boundary. */
  private val semanticDedupOracle: String =
    """WITH c AS (
      |  SELECT CAST(vec_id AS BIGINT) AS cell, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 8
      |), q AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS ev
      |  FROM embeddings
      |), d AS (
      |  SELECT q.vec_id, c.cell,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(generate_series(1, len(c.cv)),
      |        i -> (q.ev[i] - c.cv[i]) * (q.ev[i] - c.cv[i]))),
      |      (a, x) -> a + x) AS dist,
      |    q.ev
      |  FROM q CROSS JOIN c
      |), asg AS (
      |  SELECT vec_id, cell, ev FROM (
      |    SELECT vec_id, cell, ev, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d)
      |  WHERE rn = 1
      |), p AS (
      |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
      |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
      |  WHERE list_cosine_similarity(x.ev, y.ev) >= CAST(0.4 AS DOUBLE)
      |), edges AS (
      |  SELECT doc_a AS s, doc_b AS d FROM p
      |  UNION ALL SELECT doc_b, doc_a FROM p
      |), reach AS (
      |  WITH RECURSIVE r(src, node) AS (
      |    SELECT DISTINCT s, s FROM edges
      |    UNION
      |    SELECT r.src, e.d FROM r JOIN edges e ON r.node = e.s
      |  ) SELECT src, min(node) AS cluster FROM r GROUP BY src
      |), mem AS (
      |  SELECT reach.src AS vec_id, reach.cluster,
      |    list_cosine_similarity(asg.ev, c.cv) AS ccos
      |  FROM reach JOIN asg ON reach.src = asg.vec_id
      |             JOIN c ON asg.cell = c.cell
      |), keep AS (
      |  SELECT cluster, vec_id AS kept_id FROM (
      |    SELECT cluster, vec_id, row_number() OVER (
      |      PARTITION BY cluster ORDER BY ccos, vec_id) AS rn FROM mem)
      |  WHERE rn = 1
      |)
      |SELECT m.vec_id AS dropped_id, keep.kept_id
      |FROM mem m JOIN keep ON m.cluster = keep.cluster
      |WHERE m.vec_id <> keep.kept_id
      |ORDER BY dropped_id, kept_id""".stripMargin

  /** Fixed centroid seed shared by `kmeans_assign`/`cluster_labels`/
    * `dedup_semantic`: the
    * first 8 vectors, in vec_id order. The oracle equates the centroid
    * ARRAY INDEX with its cell = vec_id — an identity that only holds
    * when vec_ids 0..7 all exist and are dense, so assert exactly that:
    * a data-gen change to 1-based or sparse ids fails HERE with a
    * pointer to the cause instead of as two bare oracle hash
    * mismatches. (8-row bounded collect — the IVF-build pattern.) */
  private def fixedCentroids(
      emb: org.apache.spark.sql.DataFrame): Seq[Seq[Double]] = {
    val rows = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(col("vec_id").cast("long"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .collect()
    val ids = rows.map(_.getLong(0)).toSeq
    require(ids == (0L until 8L),
      s"kmeans centroid seed expects dense vec_ids 0..7, got $ids")
    rows.map(_.getSeq[Double](1)).toSeq
  }

  /** Shared CTE for the k-means rows: the Lloyd ASSIGNMENT replayed
    * op-for-op — centroids = the first 8 vectors cast to double, distance
    * = NearestCells' left-to-right Σ(x−c)² fold (list_reduce over a
    * prepended 0.0), argmin under the (dist, cell) total order. `asg` is
    * the (vec_id, cell) partition of the corpus. */
  private val kmeansAssignCte: String =
    """WITH c AS (
      |  SELECT CAST(vec_id AS BIGINT) AS cell, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 8
      |), q AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
      |), d AS (
      |  SELECT q.vec_id, c.cell,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(generate_series(1, len(c.cv)),
      |        i -> (q.ev[i] - c.cv[i]) * (q.ev[i] - c.cv[i]))),
      |      (a, x) -> a + x) AS dist
      |  FROM q CROSS JOIN c
      |), a AS (
      |  SELECT vec_id, cell, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist, cell) AS rn
      |  FROM d
      |), asg AS (
      |  SELECT vec_id, cell FROM a WHERE rn = 1
      |)""".stripMargin

  /** Shared oracle prefix for the DSIR rows: portable-hash unigram+bigram
    * features into 1024 buckets (`feats`), bucket stats (`rf`/`tf`) with
    * totals, smoothed log-ratio weights (`wb`), bucket-ordered per-doc
    * weight folds (`dw`), and the deterministic top-100 (`sel`).
    * `feats`/`dw` are multiply-referenced → AS MATERIALIZED. */
  private val dsirChain: String = {
    def fold(mult: Int) =
      s"""list_reduce(list_prepend(CAST(17 AS BIGINT),
         |      list_transform(generate_series(1, length(t)),
         |                     i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
         |      (h, c) -> (h * $mult + c) % 2147483647)""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS ts
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, lang,
       |    list_concat(
       |      CASE WHEN len(ts) <= 1 THEN [array_to_string(ts, ' ')]
       |           ELSE list_transform(generate_series(1, len(ts)), i -> ts[i]) END,
       |      CASE WHEN len(ts) <= 2 THEN [array_to_string(ts, ' ')]
       |           ELSE list_transform(generate_series(1, len(ts) - 1),
       |                               i -> array_to_string(ts[i:i+1], ' ')) END) AS ss
       |  FROM toks
       |), fx AS (
       |  SELECT doc_id, lang,
       |    (${fold(31)}
       |     | (${fold(37)} << 31)) % 1024 AS bucket
       |  FROM (SELECT doc_id, lang, unnest(ss) AS t FROM sh)
       |), feats AS MATERIALIZED (
       |  SELECT doc_id, lang, bucket, CAST(count(*) AS BIGINT) AS k
       |  FROM fx GROUP BY 1, 2, 3
       |), rf AS (SELECT bucket, CAST(sum(k) AS BIGINT) AS cr FROM feats GROUP BY bucket),
       |tf AS (SELECT bucket, CAST(sum(k) AS BIGINT) AS ct
       |       FROM feats WHERE lang = 'en' GROUP BY bucket),
       |rt AS (SELECT CAST(sum(cr) AS BIGINT) AS rtot FROM rf),
       |tt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS ttot FROM tf),
       |wb AS (
       |  SELECT rf.bucket,
       |    ln(CAST(coalesce(tf.ct, 0) + 1 AS DOUBLE) / CAST(ttot + 1024 AS DOUBLE))
       |    - ln(CAST(rf.cr + 1 AS DOUBLE) / CAST(rtot + 1024 AS DOUBLE)) AS w
       |  FROM rf LEFT JOIN tf ON rf.bucket = tf.bucket CROSS JOIN rt CROSS JOIN tt
       |), dw AS MATERIALIZED (
       |  SELECT f.doc_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(
       |        list_sort(list(struct_pack(bucket := f.bucket, k := f.k, w := wb.w))),
       |        s -> CAST(s.k AS DOUBLE) * s.w)),
       |      (a, x) -> a + x) AS weight
       |  FROM feats f JOIN wb ON f.bucket = wb.bucket
       |  GROUP BY f.doc_id
       |), sel AS (
       |  SELECT doc_id, weight FROM dw ORDER BY weight DESC, doc_id LIMIT 100
       |)""".stripMargin
  }

  /** The Lloyd-assignment distance fold, parametrized by the centroid
    * CTE alias — NearestCells' left-to-right Σ(x−c)² in index order. */
  private def lloydDist(cTab: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, len($cTab.cv)),
       |        i -> (q.ev[i] - $cTab.cv[i]) * (q.ev[i] - $cTab.cv[i]))),
       |      (a, x) -> a + x)""".stripMargin

  /** Shared oracle prefix for the Lloyd-training rows: `q` (double-cast
    * corpus), `c0` (the fixed 8-seed), then `rounds` full mean-update
    * rounds — each an assignment argmin (a_r), the two-level vec_id%16
    * fold (v/l/m_r), per-cell counts (n_r) and the next centroid table
    * (c_r, empty cells carried forward). Every a/c level is referenced
    * more than once → AS MATERIALIZED (the corenum inlining lesson). */
  private def lloydChain(rounds: Int): String = {
    def round(r: Int, prev: String) =
      s"""a$r AS MATERIALIZED (
         |  SELECT vec_id, cell FROM (
         |    SELECT q.vec_id, c.cell, row_number() OVER (
         |      PARTITION BY q.vec_id ORDER BY ${lloydDist("c")}, c.cell) AS rn
         |    FROM q CROSS JOIN $prev c)
         |  WHERE rn = 1
         |), v$r AS (
         |  SELECT a.cell, a.vec_id % 16 AS bkt, a.vec_id,
         |    unnest(generate_series(1, len(q.ev))) AS dim, unnest(q.ev) AS v
         |  FROM a$r a JOIN q ON a.vec_id = q.vec_id
         |), l$r AS (
         |  SELECT cell, dim, bkt,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(vec_id := vec_id, v := v))),
         |        s -> s.v)), (a, x) -> a + x) AS s1
         |  FROM v$r GROUP BY 1, 2, 3
         |), m$r AS (
         |  SELECT cell, dim,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(list_sort(list(struct_pack(bkt := bkt, s1 := s1))),
         |        s -> s.s1)), (a, x) -> a + x) AS s2
         |  FROM l$r GROUP BY 1, 2
         |), n$r AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS cnt FROM a$r GROUP BY cell
         |), c$r AS MATERIALIZED (
         |  SELECT m.cell, list(m.s2 / CAST(n.cnt AS DOUBLE) ORDER BY m.dim) AS cv
         |  FROM m$r m JOIN n$r n ON m.cell = n.cell GROUP BY m.cell
         |  UNION ALL
         |  SELECT p.cell, p.cv FROM $prev p
         |  WHERE p.cell NOT IN (SELECT cell FROM n$r)
         |)""".stripMargin
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
       |), c0 AS (
       |  SELECT CAST(vec_id AS BIGINT) AS cell, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < 8
       |),
       |${(1 to rounds).map(r => round(r, s"c${r - 1}")).mkString(",\n")}""".stripMargin
  }

  /** SSE block for [[lloydChain]] consumers: per-vector min squared-L2
    * distance to `cTab`'s centroids, summed by the two-level vec_id%16
    * fold — emits CTEs `${p}d` (per-vec min dist), `${p}l1`, and the
    * 1-row `${p}sse`. */
  private def lloydSseBlock(cTab: String, p: String): String =
    s"""${p}d AS (
       |  SELECT q.vec_id, min(${lloydDist("c")}) AS d
       |  FROM q CROSS JOIN $cTab c GROUP BY q.vec_id
       |), ${p}l1 AS (
       |  SELECT vec_id % 16 AS bkt,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_sort(list(struct_pack(vec_id := vec_id, d := d))),
       |        s -> s.d)), (a, x) -> a + x) AS s1
       |  FROM ${p}d GROUP BY 1
       |), ${p}sse AS (
       |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_sort(list(struct_pack(bkt := bkt, s1 := s1))),
       |      s -> s.s1)), (a, x) -> a + x) AS sse
       |  FROM ${p}l1
       |)""".stripMargin

  /** Shared oracle for the exact-ANN rows (brute force and IVF at the
    * exhaustive nProbe = nCells operating point, which is ≡ brute force):
    * per-query cosine top-5, ties by neighbor id. */
  private val annTopkOracle: String =
    """SELECT query_id, rank, neighbor_id, cos_sim FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim,
      |    CAST(row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(c.embedding AS DOUBLE[])) DESC,
      |               c.vec_id) AS BIGINT) AS rank
      |  FROM embeddings q JOIN embeddings c
      |    ON q.vec_id < 10 AND q.vec_id <> c.vec_id
      |) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Shared BM25 scoring CTE (td/dl/q/tf/consts → `scored(doc_id,
    * score)`) behind `term_search_bm25` and `hybrid_rrf`: integer
    * tf/df/N aggregates, one fixed-order double expression per row
    * (Okapi k1 = 1.2, b = 0.75 spelled as the exact-double literals
    * 2.2/1.2/0.25/0.75), mirrored token-for-token by [[bm25Scored]]. */
  private val bm25ScoredCte: String =
    """WITH td AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
      |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
      |), dl AS (
      |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM td
      |), q AS (
      |  SELECT doc_id, term FROM (SELECT doc_id, unnest(ts) AS term FROM td)
      |  WHERE term IN ('hash', 'join', 'scan')
      |), tf AS (
      |  SELECT doc_id,
      |    CAST(count(CASE WHEN term = 'hash' THEN 1 END) AS BIGINT) AS tf_hash,
      |    CAST(count(CASE WHEN term = 'join' THEN 1 END) AS BIGINT) AS tf_join,
      |    CAST(count(CASE WHEN term = 'scan' THEN 1 END) AS BIGINT) AS tf_scan
      |  FROM q GROUP BY doc_id
      |), consts AS (
      |  SELECT
      |    (SELECT CAST(count(*) AS BIGINT) FROM dl) AS n_docs,
      |    (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl,
      |    CAST(count(DISTINCT CASE WHEN term = 'hash' THEN doc_id END) AS BIGINT) AS df_hash,
      |    CAST(count(DISTINCT CASE WHEN term = 'join' THEN doc_id END) AS BIGINT) AS df_join,
      |    CAST(count(DISTINCT CASE WHEN term = 'scan' THEN doc_id END) AS BIGINT) AS df_scan
      |  FROM q
      |), scored AS (
      |  SELECT t.doc_id,
      |    (CASE WHEN tf_hash > 0 THEN
      |      ln((CAST(n_docs - df_hash AS DOUBLE) + 0.5) / (CAST(df_hash AS DOUBLE) + 0.5) + 1.0)
      |        * (CAST(tf_hash AS DOUBLE) * 2.2)
      |        / (CAST(tf_hash AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |            (CAST(d.dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
      |      ELSE 0.0 END)
      |    + (CASE WHEN tf_join > 0 THEN
      |      ln((CAST(n_docs - df_join AS DOUBLE) + 0.5) / (CAST(df_join AS DOUBLE) + 0.5) + 1.0)
      |        * (CAST(tf_join AS DOUBLE) * 2.2)
      |        / (CAST(tf_join AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |            (CAST(d.dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
      |      ELSE 0.0 END)
      |    + (CASE WHEN tf_scan > 0 THEN
      |      ln((CAST(n_docs - df_scan AS DOUBLE) + 0.5) / (CAST(df_scan AS DOUBLE) + 0.5) + 1.0)
      |        * (CAST(tf_scan AS DOUBLE) * 2.2)
      |        / (CAST(tf_scan AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |            (CAST(d.dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
      |      ELSE 0.0 END) AS score
      |  FROM tf t JOIN dl d USING (doc_id) CROSS JOIN consts
      |)""".stripMargin

  /** Engine twin of [[bm25ScoredCte]]: (doc_id, score) for every doc
    * matching ≥ 1 query term. The pre-round-13 `log` stays: this row's
    * ln-of-count-ratio arguments sit in the measured fdlibm/libm
    * agreement region (the Ieee754Ln scaladoc's history). */
  private def bm25Scored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val base = Tables.documents(s, dir)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
    val dl = base.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    val q = base.select(col("doc_id"), explode(col("ts")).as("term"))
      .filter(col("term").isin("hash", "join", "scan"))
    val tf = q.groupBy("doc_id").agg(
      count(when(col("term") === "hash", 1)).as("tf_hash"),
      count(when(col("term") === "join", 1)).as("tf_join"),
      count(when(col("term") === "scan", 1)).as("tf_scan"))
    val dfs = q.agg(
      count_distinct(when(col("term") === "hash", col("doc_id"))).as("df_hash"),
      count_distinct(when(col("term") === "join", col("doc_id"))).as("df_join"),
      count_distinct(when(col("term") === "scan", col("doc_id"))).as("df_scan"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val consts = corpus.crossJoin(dfs)
    // one fixed-order double expression per row — mirrored in the oracle
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def bm25(tfc: org.apache.spark.sql.Column,
        dfc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(tfc > 0,
        log(((col("n_docs") - dfc).cast("double") + lit(0.5)) /
            (dfc.cast("double") + lit(0.5)) + lit(1.0)) *
          (tfc.cast("double") * lit(2.2)) /
          (tfc.cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") / avgdl))))
        .otherwise(lit(0.0))
    tf.join(dl, "doc_id")
      .join(broadcast(consts))
      .withColumn("score",
        bm25(col("tf_hash"), col("df_hash")) +
          bm25(col("tf_join"), col("df_join")) +
          bm25(col("tf_scan"), col("df_scan")))
      .select(col("doc_id"), col("score"))
  }

  /** Oracle for `ann_topk_sq`: replays the ENTIRE SQ8 pipeline —
    * per-dimension exact min/max (order-independent selections, so both
    * engines aggregate to the same floats), the affine quantization
    * c_i = least(⌊(v_i − mn_i)·255/(mx_i − mn_i)⌋, 255) mirrored
    * op-for-op per dimension (constant dims CASE to 0 — the engine's
    * plan-time branch evaluated at runtime on the same values), and the
    * all-integer squared code distance under the total (qdist,
    * neighbor_id) order. Unlike the k-means-fitted ANN families there is
    * NO separation or exactness knob here: the operating point itself is
    * deterministic, so this oracle is exact on any corpus. */
  private val annSqOracle: String = {
    val dim = 64
    val mmAggs = (0 until dim).map(i =>
      s"min(CAST(embedding[${i + 1}] AS DOUBLE)) AS mn$i, " +
        s"max(CAST(embedding[${i + 1}] AS DOUBLE)) AS mx$i")
      .mkString(",\n    ")
    val codeExprs = (0 until dim).map(i =>
      s"CASE WHEN mm.mx$i > mm.mn$i THEN " +
        s"CAST(least(floor((CAST(e.embedding[${i + 1}] AS DOUBLE) - mm.mn$i)" +
        s" * 255.0 / (mm.mx$i - mm.mn$i)), 255.0) AS BIGINT) " +
        s"ELSE CAST(0 AS BIGINT) END AS c$i")
      .mkString(",\n    ")
    val distTerms = (0 until dim).map(i =>
      s"(q.c$i - c.c$i) * (q.c$i - c.c$i)").mkString(" +\n      ")
    s"""WITH mm AS (
       |  SELECT $mmAggs
       |  FROM embeddings
       |), codes AS MATERIALIZED (
       |  SELECT e.vec_id,
       |    $codeExprs
       |  FROM embeddings e CROSS JOIN mm
       |), d AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST($distTerms AS BIGINT) AS qdist
       |  FROM codes q JOIN codes c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
       |), r AS (
       |  SELECT query_id, neighbor_id, qdist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY qdist, neighbor_id) AS BIGINT) AS rank
       |  FROM d
       |)
       |SELECT query_id, rank, neighbor_id, qdist
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for `bpe_merges`: replays TextProfile.bpeMerges' k-step loop
    * as a k-level CTE chain — seg{i} applies level i's argmax merge (the
    * scalar subqueries) to seg{i-1} with the SAME left-to-right `replace`
    * semantics, so segmentation strings, per-level pair counts, and the
    * tie-broken argmax all match the engine exactly. chr(31) = the U+001F
    * symbol separator (outside the corpus charset). */
  /** Shared CTE chain for the BPE oracles: distinct words (with counts
    * AND the word itself carried through every segmentation level, so
    * the encode oracle can join symbol counts back to documents). */
  private def bpeChain(k: Int): String = {
    val head =
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), w AS (
        |  SELECT t AS w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY t
        |), seg0 AS (
        |  SELECT w, rtrim(regexp_replace(w, '(.)', '\1' || chr(31), 'g'), chr(31)) AS seg, cnt FROM w
        |)""".stripMargin
    val levels = (1 to k).map { i =>
      s""", p$i AS (
         |  SELECT sy[i] AS lhs, sy[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(seg, chr(31)) AS sy, cnt,
         |               unnest(generate_series(1, len(string_split(seg, chr(31))) - 1)) AS i
         |        FROM seg${i - 1} WHERE len(string_split(seg, chr(31))) >= 2)
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT $i AS step, lhs, rhs, n FROM p$i ORDER BY n DESC, lhs, rhs LIMIT 1
         |), seg$i AS (
         |  SELECT w, replace(seg, (SELECT lhs || chr(31) || rhs FROM b$i),
         |                         (SELECT lhs || rhs FROM b$i)) AS seg, cnt
         |  FROM seg${i - 1}
         |)""".stripMargin
    }.mkString
    head + levels
  }

  private def bpeMergesOracle(k: Int): String =
    bpeChain(k) + (1 to k).map(i => s"SELECT step, lhs, rhs, n FROM b$i")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY step")

  /** Oracle for `bpe_encode`: the same chain, closed by joining each
    * word's final symbol count back onto the doc→word stream. */
  private def bpeEncodeOracle(k: Int): String =
    bpeChain(k) +
      s""",
         |wsym AS (
         |  SELECT w, CAST(len(string_split(seg, chr(31))) AS BIGINT) AS n_sym
         |  FROM seg$k
         |), dt AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS w
         |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_sym) AS BIGINT) AS n_bpe
         |FROM dt JOIN wsym USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared oracle for both exact-dedup variants: their contract is the
    * same — grouping by content IS grouping by text. */
  private val exactDedupOracle: String =
    """SELECT keep_id, n_dups FROM (
      |  SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
      |  FROM documents GROUP BY text
      |) ORDER BY keep_id""".stripMargin

  /** Shared lang-ID CTE: replays the LangId heuristic per doc
    * (doc_id carried so both the distribution and the confusion
    * matrix close over it). */
  private val langPredCte: String =
    """WITH sc AS (
        |  SELECT doc_id,
        |    (CASE WHEN contains(p, ' the ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' and ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' of ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, 'ing ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' is ') THEN 1 ELSE 0 END) AS s_en,
        |    (CASE WHEN contains(p, ' der ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' und ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' die ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, 'sch') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' ist ') THEN 1 ELSE 0 END) AS s_de,
        |    (CASE WHEN contains(p, ' le ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' la ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' et ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' les ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' est ') THEN 1 ELSE 0 END) AS s_fr,
        |    (CASE WHEN contains(p, ' el ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' que ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' los ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' una ') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, ' es ') THEN 1 ELSE 0 END) AS s_es,
        |    (CASE WHEN contains(p, '的') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, '了') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, '是') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, '我') THEN 1 ELSE 0 END) +
        |    (CASE WHEN contains(p, '不') THEN 1 ELSE 0 END) AS s_zh
        |  FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents)
        |), sel AS (
        |  SELECT doc_id, CASE
        |    WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
        |    WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
        |    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
        |    WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
        |    WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
        |    ELSE 'de' END AS lang_pred
        |  FROM sc
        |)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ----- deduplication -------------------------------------------------

    QueryDef.of("dedup_exact", exactDedupOracle) { (s, dir) =>
      Dedup.exact(Tables.documents(s, dir)).orderBy("keep_id")
    },

    // Same answer as dedup_exact, but only duplicate candidates' text ever
    // crosses a shuffle (two-phase strong-hash grouping) — the shape that
    // survives 100 TB.
    QueryDef.of("dedup_fingerprint", exactDedupOracle) { (s, dir) =>
      Dedup.exactByFingerprint(Tables.documents(s, dir)).orderBy("keep_id")
    },

    // C4-style NORMALIZED exact dedup — the "soft exact" tier catching
    // reformat-only clones (case + whitespace changes) that raw exact
    // dedup misses: group on lower(collapse-whitespace(text)). Same
    // min-id-survivor contract as dedup_exact; the oracle replays the
    // normalization bit-for-bit (explicit whitespace class — Java \s ≡
    // [ \t\n\x0B\f\r]; lower() parity with DuckDB is already certified
    // corpus-wide by the lang-ID rows' lowered CTE).
    QueryDef.of("dedup_exact_norm",
      """SELECT keep_id, n_dups FROM (
        |  SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
        |  FROM documents
        |  GROUP BY lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')))
        |) ORDER BY keep_id""".stripMargin) { (s, dir) =>
      Dedup.exactNormalized(Tables.documents(s, dir)).orderBy("keep_id")
    },

    // Exact n-gram Jaccard near-dup pairs via the prefix-filtered
    // (AllPairs/PPJoin) join — EXACT ON ANY CORPUS, which is what an
    // oracle-checked row must be: MinHash-LSH discovery misses
    // near-threshold pairs with probability (1-t^r)^b (~60% at t=0.5 with
    // 8×4 banding — measured: one true pair lost at sf0.1, where the
    // corpus has borderline pairs). Prefix filtering is the canonical
    // scalable EXACT algorithm: each doc posts only its rarest
    // n−⌈t·n⌉+1 shingles, so candidate cost is Σ df² over PREFIX postings
    // (Zipf-robust), then full-set verification. Scores stay bit-exact:
    // verification intersects full hashed-shingle sets and the 64-bit
    // xxhash64 shingle hash is injective on any realistic corpus
    // (collision odds ~n²/2^64; raw ≡ hashed asserted in DedupSpec).
    // The MinHash→verify composed pipeline remains the higher-throughput
    // approximate-recall option (Dedup.minhashNgramJaccard, stress bench).
    QueryDef.of("ngram_jaccard",
      shingleCte +
        """
          |SELECT doc_a, doc_b,
          |  round(CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE), 6) AS jaccard
          |FROM p
          |WHERE CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE) >= 0.5
          |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccard(Tables.documents(s, dir), k = 3, threshold = 0.5,
          maxShingleDf = 1000, hashShingles = true, prefixFilter = true)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // MinHash+LSH near-dup pair DETECTION: banded signatures, candidate
    // bucket join, signature-estimate verification at 0.5. The corpus is
    // cleanly separated (planted near-dups >= 0.9 true Jaccard, everything
    // else < 0.3), so the detected pair set must equal the exact-Jaccard
    // pair set, which the oracle computes exactly.
    QueryDef.of("dedup_minhash",
      shingleCte +
        """
          |SELECT doc_a, doc_b FROM p
          |WHERE CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE) >= 0.5
          |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      Dedup.minhashLsh(Tables.documents(s, dir), k = 3, numHashes = 32, bands = 8,
          threshold = 0.5)
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    },

    // SimHash near-dup pair detection — same clean-separation argument as
    // dedup_minhash: shingle-simhash puts planted near-dups at Hamming ≤ 10
    // (≤ 12 at sf0.001) and unrelated pairs at ≥ 14 (≥ 13), so (bands=16,
    // maxHamming=12) returns exactly the true-Jaccard pair set (recall
    // guaranteed by pigeonhole: hamming 12 < 16 bands).
    QueryDef.of("dedup_simhash",
      shingleCte +
        """
          |SELECT doc_a, doc_b FROM p
          |WHERE CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE) >= 0.5
          |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), bands = 16, maxHamming = 12)
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    },

    // SimHash at the SCALE operating point (bands=4 → 16-bit band values,
    // maxHamming=3): the configuration to run on a real corpus, where
    // random band collisions stay ∝ n²/2^16 and recall for hamming <= 3 is
    // structural (3 < 4 bands ⇒ pigeonhole). The oracle recomputes the
    // portable signatures themselves (see simhashScaleOracle), so this row
    // certifies the scale point with zero separation assumptions.
    QueryDef.of("dedup_simhash_scale", simhashScaleOracle) { (s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), bands = 4, maxHamming = 3,
          portableHash = true)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy("doc_a", "doc_b")
    },

    // Embedding-cosine near-dup over corpus ∪ planted copies (vec_id +
    // 100000): the LSH path (hyperplane bands; identical vectors collide in
    // every band, so recall on true duplicates is deterministic), threshold
    // 0.9 against a corpus whose max non-identical cosine is ~0.51 → the
    // result is exactly the planted pairs.
    QueryDef.of("dedup_embedding",
      """SELECT vec_id AS id_a, CAST(vec_id + 100000 AS BIGINT) AS id_b
        |FROM embeddings ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val planted = e.unionAll(
        e.select((col("vec_id") + lit(100000L)).as("vec_id"), col("embedding")))
      Dedup.embeddingNearDupLsh(planted, threshold = 0.9).orderBy("id_a", "id_b")
    },

    // SEMANTIC dedup (SemDeDup, Abbas et al. 2023): embedding-space
    // near-duplicate GROUPS found only within k-means cells, one
    // representative kept per group — the paper's keep-least-prototypical
    // rule (lowest cosine to the cell centroid, ties to min vec_id).
    // Unlike dedup_embedding (LSH recall on planted exact copies) this
    // row runs on the RAW corpus at τ = 0.4 — real graded-similarity
    // groups (21/24/262 pairs at sf0.001/0.01/0.1) — and its oracle
    // replays the WHOLE algorithm (assignment fold, pair cosines,
    // reachability components, keeper order) with no separation
    // assumption: every arithmetic op is mirrored, so the row is exact
    // at any corpus. Scale: the quadratic is per-cell (Σ|cell|², the
    // paper's 50k-cluster argument), assignment is a shuffle-free scan,
    // keeper a partial-agg min_by — see Similarity.semanticDedup.
    QueryDef.of("dedup_semantic", semanticDedupOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticDedup(emb, fixedCentroids(emb), threshold = 0.4,
          loopParts = 1, localPairsCap = 500000L)
        .orderBy("dropped_id", "kept_id")
    },

    // Full dedup pipeline: near-dup pairs → connected components → keep the
    // min doc_id per cluster, drop every other member. Oracle resolves
    // components with a recursive reachability CTE (components are small,
    // so the closure is cheap).
    QueryDef.of("dedup_survivors", survivorsOracle) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // exact pair detection (prefix-filtered join — see ngram_jaccard's
      // rationale): survivors are an exactness contract, so the detector
      // must be exact on any corpus, not recall-probabilistic
      val pairs = Dedup.ngramJaccard(docs, k = 3, threshold = 0.5,
        maxShingleDf = 1000, hashShingles = true, prefixFilter = true)
        .select("doc_a", "doc_b")
      // loopParts PINNED (= what auto sizing picks at every driver SF —
      // the pair graph is a few thousand edges, far under one 50k-pair
      // partition): the cluster loop's plan is byte-identical run-to-run.
      // localPairsCap (r16): under the cap the components resolve via the
      // driver-local union-find twin (bit-identical — see
      // duplicateClusters' scaladoc), skipping the RDD loop's ~15
      // scheduling-latency jobs; the 100 TB path falls back to the
      // distributed loop above the cap.
      val losers = Dedup.duplicateClusters(pairs, loopParts = 1,
        localPairsCap = 500000L)
        .filter(col("doc_id") =!= col("cluster"))
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    },

    // The SAME survivors pipeline through the composed SCALE engine
    // (MinHash-LSH candidate discovery → exact Jaccard verification of
    // candidates only — discovery cost ∝ duplicate mass, the engine you'd
    // run on a 100 TB crawl). On the separated Verify corpora (planted
    // pairs ≥ 0.9 true Jaccard, everything else < 0.3) LSH discovery at
    // J ≥ 0.9 succeeds with p ≈ 0.9998 per pair and the exact verification
    // thresholds identically, so the pair set — and therefore the survivor
    // set — provably equals the exact engine's (asserted corpus-wide in
    // DedupSpec). This row gives the scale engine its own driver-visible
    // certification instead of test-suite-only coverage.
    QueryDef.of("dedup_survivors_composed", survivorsOracle) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minhashNgramJaccard(docs, k = 3, threshold = 0.5)
        .select("doc_a", "doc_b")
      // loopParts pinned — see dedup_survivors' rationale
      val losers = Dedup.duplicateClusters(pairs, loopParts = 1,
        localPairsCap = 500000L)
        .filter(col("doc_id") =!= col("cluster"))
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    },

    // The ENGINE-CHOOSING front door on the oracle surface: nearDupAuto
    // measures the exact-dup fraction from a bounded hash-ordered sample
    // and picks prefix-exact (clean corpus) or composed MinHash→verify
    // (dup-heavy corpus), then the survivors pipeline runs on whatever it
    // chose. Correct under EITHER choice here: on the separated Verify
    // corpora the composed engine's pair set provably equals the exact
    // engine's (the dedup_survivors_composed argument), so the selector
    // composes with two certified engines and the oracle is the same
    // recursive-CTE survivor set. This row certifies the auto path a user
    // would actually call — stress case dedup_auto_10x covers the
    // dup-heavy branch's performance; this covers driver-visible
    // correctness.
    QueryDef.of("dedup_auto", survivorsOracle) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.nearDupAuto(docs, k = 3, threshold = 0.5).pairs
        .select("doc_a", "doc_b")
      // loopParts pinned — see dedup_survivors' rationale
      val losers = Dedup.duplicateClusters(pairs, loopParts = 1,
        localPairsCap = 500000L)
        .filter(col("doc_id") =!= col("cluster"))
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    },

    // DUPLICATE-CLUSTER SIZE HISTOGRAM — the dedup tier's dashboard row
    // (the gopher_funnel idiom applied to near-dup structure): how many
    // duplicate families of each size the corpus carries, over the SAME
    // exact pair detection + union-find the survivors rows certify. The
    // distribution is what sizes a dedup policy's savings estimate and
    // what flags pathological families (one 10⁶-member cluster = a
    // boilerplate template, not content). All integer; the oracle
    // composes the shared reach CTE with two stacked counts.
    QueryDef.of("dedup_cluster_sizes",
      dupClustersCte +
        """
          |SELECT size, CAST(count(*) AS BIGINT) AS n_clusters FROM (
          |  SELECT cluster, CAST(count(*) AS BIGINT) AS size
          |  FROM reach GROUP BY cluster
          |) GROUP BY size ORDER BY size""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccard(docs, k = 3, threshold = 0.5,
        maxShingleDf = 1000, hashShingles = true, prefixFilter = true)
        .select("doc_a", "doc_b")
      // loopParts pinned — see dedup_survivors' rationale
      Dedup.duplicateClusters(pairs, loopParts = 1,
        localPairsCap = 500000L)
        .groupBy("cluster").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_clusters"))
        .orderBy("size")
    },

    // Containment-similarity join — ASYMMETRIC near-dup: the fraction of
    // the SOURCE doc's shingles found in dst (excerpt/quote detection —
    // tiny Jaccard, containment ≈ 1 in the quote→page direction). Exact
    // on any corpus via the one-sided prefix filter (probe prefixes ×
    // full postings); the oracle derives both ordered directions from
    // the same exact intersection CTE, the score is one mirrored integer
    // division. Ordered pairs, total order on (src, dst).
    QueryDef.of("dedup_containment",
      shingleCte +
        """
          |SELECT src, dst, containment FROM (
          |  SELECT doc_a AS src, doc_b AS dst,
          |    CAST(i AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
          |  FROM p
          |  UNION ALL
          |  SELECT doc_b, doc_a, CAST(i AS DOUBLE) / CAST(n_b AS DOUBLE)
          |  FROM p
          |) WHERE containment >= 0.8
          |ORDER BY src, dst""".stripMargin) { (s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), k = 3,
          threshold = 0.8, maxShingleDf = 1000)
        .orderBy("src", "dst")
    },

    // INCREMENTAL ingest dedup — the daily-ingest shape: batch = every
    // 5th doc_id (standing in for today's crawl), base = the rest
    // (already-accepted corpus). A batch doc is dropped iff its duplicate
    // component over the RESTRICTED pair graph (only pairs touching the
    // batch — the operator never does base×base work) contains a base doc,
    // or iff it is not the min-id member of a pure-batch component. The
    // oracle replays exactly that: exact-Jaccard pairs filtered to
    // batch-touching edges, recursive-CTE components, base-anchored +
    // min-id survivor rule. Exact on any corpus (prefix-filter exactness
    // theorem — no separation assumption).
    QueryDef.of("dedup_incremental",
      shingleCte +
        """,
          |pr AS (
          |  SELECT doc_a, doc_b FROM p
          |  WHERE CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE) >= 0.5
          |    AND (doc_a % 5 = 0 OR doc_b % 5 = 0)
          |),
          |edges AS (
          |  SELECT doc_a AS s, doc_b AS d FROM pr
          |  UNION ALL SELECT doc_b, doc_a FROM pr
          |),
          |reach AS (
          |  WITH RECURSIVE r(src, node) AS (
          |    SELECT DISTINCT s, s FROM edges
          |    UNION
          |    SELECT r.src, e.d FROM r JOIN edges e ON r.node = e.s
          |  ) SELECT src, min(node) AS cluster,
          |      max(CASE WHEN node % 5 <> 0 THEN 1 ELSE 0 END) AS has_base
          |    FROM r GROUP BY src
          |),
          |dropped AS (
          |  SELECT src AS doc_id FROM reach
          |  WHERE src % 5 = 0 AND (has_base = 1 OR src <> cluster)
          |)
          |SELECT doc_id FROM documents
          |WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT doc_id FROM dropped)
          |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val base = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      // loopParts pinned — see dedup_survivors' rationale
      Dedup.incrementalNearDup(base, batch, k = 3, threshold = 0.5,
          maxShingleDf = 1000, loopParts = 1, localPairsCap = 500000L)
        .orderBy("doc_id")
    },

    // Per-source duplication REPORT — the curation-dashboard view of the
    // dedup tier: for every document source, total docs, docs the exact
    // survivors pipeline would drop, and the drop rate. Same exact
    // detector + union-find as dedup_survivors (no separation assumption
    // — exact at any corpus), aggregated per source instead of listed;
    // n_docs/n_dups are exact integers and dup_rate is ONE IEEE division
    // of them. The left join against the losers list is on doc_id —
    // losers ≪ docs, AQE broadcasts it.
    QueryDef.of("dedup_rate_by_source",
      shingleCte +
        """,
          |pr AS (
          |  SELECT doc_a, doc_b FROM p
          |  WHERE CAST(i AS DOUBLE) / CAST(n_a + n_b - i AS DOUBLE) >= 0.5
          |),
          |edges AS (
          |  SELECT doc_a AS s, doc_b AS d FROM pr
          |  UNION ALL SELECT doc_b, doc_a FROM pr
          |),
          |reach AS (
          |  WITH RECURSIVE r(src, node) AS (
          |    SELECT DISTINCT s, s FROM edges
          |    UNION
          |    SELECT r.src, e.d FROM r JOIN edges e ON r.node = e.s
          |  ) SELECT src, min(node) AS cluster FROM r GROUP BY src
          |),
          |losers AS (SELECT src AS doc_id FROM reach WHERE cluster <> src)
          |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(count(l.doc_id) AS BIGINT) AS n_dups,
          |  CAST(count(l.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate
          |FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
          |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccard(docs, k = 3, threshold = 0.5,
        maxShingleDf = 1000, hashShingles = true, prefixFilter = true)
        .select("doc_a", "doc_b")
      // loopParts pinned — see dedup_survivors' rationale
      val losers = Dedup.duplicateClusters(pairs, loopParts = 1,
        localPairsCap = 500000L)
        .filter(col("doc_id") =!= col("cluster"))
        .select("doc_id").withColumn("is_dup", lit(1))
      docs.select("doc_id", "source")
        .join(losers, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), count(col("is_dup")).as("n_dups"))
        .select(col("source"), col("n_docs"), col("n_dups"),
          (col("n_dups").cast("double") / col("n_docs").cast("double"))
            .as("dup_rate"))
        .orderBy("source")
    },

    // Train/eval decontamination (the GPT-3/Pile benchmark-overlap step):
    // eval = every 7th doc_id (standing in for a benchmark), train = the
    // rest; for every train doc the count of its distinct 3-shingles that
    // appear anywhere in the eval corpus, plus the fraction of its set.
    // Oracle intersects RAW shingle strings (same CTE machinery as
    // ngram_jaccard) while the operator posts 64-bit hashes — counts agree
    // by injectivity on the corpus; the fraction division is mirrored
    // op-for-op (cast double / cast double, no rounding).
    QueryDef.of("decontaminate",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
        |         ELSE list_transform(generate_series(1, len(ts) - 2),
        |                             i -> array_to_string(ts[i:i+2], ' ')) END) AS s
        |  FROM toks
        |), ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 7 = 0),
        |tr AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh WHERE doc_id % 7 <> 0),
        |hits AS (
        |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM ex e JOIN ev ON e.g = ev.g WHERE e.doc_id % 7 <> 0 GROUP BY 1
        |)
        |SELECT tr.doc_id, tr.n_sh,
        |  COALESCE(h.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
        |  CAST(COALESCE(h.n_overlap, CAST(0 AS BIGINT)) AS DOUBLE)
        |    / CAST(tr.n_sh AS DOUBLE) AS overlap_frac
        |FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
        |ORDER BY tr.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val evalDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      Decontaminate.overlapStats(train, evalDocs, k = 3).orderBy("doc_id")
    },

    // FUZZY decontamination — decontaminate's near-duplicate second pass
    // (exact n-gram overlap misses lightly-edited benchmark copies):
    // train docs within SimHash hamming ≤ 3 of any eval doc, at the
    // PORTABLE scale operating point (bands=4: pigeonhole recall is
    // structural, and the oracle recomputes the signatures themselves —
    // the dedup_simhash_scale contract, zero separation assumptions;
    // the sig CTE prefix is shared between the two oracles). Same mod-7
    // train/eval split as decontaminate; 3/5 contaminated train docs at
    // sf0.001/sf0.01 (planted near-dup pairs straddling the split).
    QueryDef.of("decontaminate_fuzzy",
      portableSimhashCte +
        """,
          |tr AS (SELECT doc_id, sh62 FROM sig WHERE doc_id % 7 <> 0),
          |ev AS (SELECT doc_id AS eval_id, sh62 AS she FROM sig WHERE doc_id % 7 = 0)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_near,
          |  CAST(min(bit_count(xor(tr.sh62, ev.she))) AS BIGINT) AS min_hamming
          |FROM tr JOIN ev ON bit_count(xor(tr.sh62, ev.she)) <= 3
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val evalDocs = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      Decontaminate.fuzzyOverlap(train, evalDocs, bands = 4, maxHamming = 3)
        .orderBy("doc_id")
    },

    // ----- similarity search --------------------------------------------

    // Exact ANN baseline: 10 query vectors (broadcast) against the corpus,
    // cosine top-5 each. Scales as |corpus| × |queries| with the queries
    // broadcast — linear in the corpus, no all-pairs product.
    QueryDef.of("ann_topk", annTopkOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .orderBy("query_id", "rank")
    },

    // kNN CLASSIFICATION over the certified exact top-5 (same query set
    // as ann_topk, whose per-rank neighbor set is hash-certified): the
    // label-propagation / weak-labeling primitive. Votes are exact
    // integers; the winner is rank 1 under the TOTAL order (votes DESC,
    // label ASC) — the per-query window is ≤ k rows, never data-sized.
    QueryDef.of("knn_classify",
      """WITH nn AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id) AS rnk
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10
        |), v AS (
        |  SELECT nn.query_id, e.label AS pred_label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
        |  WHERE nn.rnk <= 5 GROUP BY 1, 2
        |), p AS (
        |  SELECT query_id, pred_label, votes, row_number() OVER (
        |    PARTITION BY query_id ORDER BY votes DESC, pred_label) AS rn
        |  FROM v
        |)
        |SELECT query_id, pred_label, votes FROM p WHERE rn = 1
        |ORDER BY query_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.knnClassify(emb.filter(col("vec_id") < 10), emb, k = 5)
        .orderBy("query_id")
    },

    // LSH-bucketed ANN (the 100 TB path): approximate by construction at
    // this operating point, so rows-only — exactness of the bucketing
    // machinery is covered by SimilaritySpec against the brute-force path.
    QueryDef.rowsOnly("ann_topk_lsh") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // 8-bit bands (nBits=32/bands=4): each query scores ~bands·n/256
      // candidates instead of flooding 2-bit buckets with the whole corpus.
      // hammingProbes = 1 (Lv et al. multi-probe, query-side-only ×9
      // expansion): hard-corpus recall@5 0.65 → 0.89 at LOWER measured
      // cost than exact-bucket probing (stress ann_lsh_mp_100x 0.97 s vs
      // ann_lsh_100x 1.27 s — the probe expansion rides the same broadcast
      // and the corpus is hashed/scanned once either way), and
      // SimilaritySpec's candidate-superset property proves recall can
      // only go up.
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
          nBits = 32, bands = 4, hammingProbes = 1)
        .orderBy("query_id", "rank")
    },

    // IVF ANN (rows-only: KMeans cell boundaries make the result set
    // approximate by construction; recall properties are asserted in
    // SimilaritySpec against brute force).
    QueryDef.rowsOnly("ann_topk_ivf") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
          nCells = 16, nProbe = 4)
        .orderBy("query_id", "rank")
    },

    // IVF at the EXACT operating point: nProbe = nCells probes every cell,
    // so the candidate set is the whole corpus and the result is ≡ brute
    // force (SimilaritySpec asserts this structurally) — which makes the
    // IVF machinery (sample-fit quantizer, native cell assignment, cell
    // join, partial-agg top-k) certifiable against the same DuckDB oracle
    // as ann_topk. The approximate operating point above stays benched for
    // the speedup claim; this row certifies the engine's plumbing end-to-end.
    QueryDef.of("ann_topk_ivf_exact", annTopkOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
          nCells = 16, nProbe = 16)
        .orderBy("query_id", "rank")
    },

    // IVF with a FULL-CORPUS LLOYD-TRAINED coarse quantizer (2 exact
    // distributed mean-update rounds from the sample-fit centroids —
    // kmeans_lloyd's machinery feeding a production index), certified at
    // the exhaustive point: nProbe = nCells ≡ brute force whatever the
    // centroids, so the same ann_topk oracle pins the trained-quantizer
    // index end-to-end (buildIvfIndexWith assignment, probe, rescore).
    // The recall payoff of training at narrow nProbe is measured in the
    // stress block's ivf_lloyd-vs-ivf curve, not asserted here.
    QueryDef.of("ann_topk_ivf_lloyd_exact", annTopkOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val seed = Similarity.buildIvfIndex(emb, nCells = 16)
      val trained = Similarity.lloydCentroidsTrained(emb, seed.centroids,
        rounds = 2)
      seed.release()
      val idx = Similarity.buildIvfIndexWith(emb, trained)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), idx, k = 5,
          nProbe = trained.size)
        .orderBy("query_id", "rank")
    },

    // PRODUCT QUANTIZATION ANN (Jégou et al. 2011) — the third point of
    // the quantization triad (LSH / IVF / PQ): 8 subspace codebooks of 16
    // centroids each (codes = 8 small ints ≈ 32× thinner than the dim-64
    // embedding — the approximate scan reads the CODE table, never the
    // embedding table; m = 8 because the corpus is unit-norm near-random,
    // where m = 4's reconstruction error swamps the tight cosine gaps —
    // measured recall@3 0.2 → ≥ 0.5 at m = 8, SimilaritySpec), native
    // PqAdcDistance scoring, bounded-aggregator shortlist (4k), exact
    // cosine rescore of the shortlist only. Approximate by construction →
    // rows-only, same as ann_topk_lsh/_ivf; the machinery is
    // oracle-certified by the _exact sibling below.
    QueryDef.rowsOnly("ann_topk_pq") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.buildPqIndex(emb, m = 8, ksub = 16)
      Similarity.pqTopK(emb.filter(col("vec_id") < 10), idx, emb, k = 5,
          shortlist = 20)
        .orderBy("query_id", "rank")
    },

    // PQ at the EXACT operating point: shortlist ≥ corpus size keeps every
    // candidate, so the exact rescore sees the full corpus and the result
    // is ≡ brute force — certifying the PQ machinery (per-subspace
    // sample-fit codebooks, native slice+NearestCells encoding, ADC
    // shortlist scan, broadcast rescore join) against the same DuckDB
    // oracle as ann_topk (the ann_topk_ivf_exact pattern). The
    // corpus-sized shortlist aggregator is certification-scale only —
    // the operating point above is what's benched.
    QueryDef.of("ann_topk_pq_exact", annTopkOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.buildPqIndex(emb, m = 8, ksub = 16)
      Similarity.pqTopK(emb.filter(col("vec_id") < 10), idx, emb, k = 5,
          shortlist = 100000)
        .orderBy("query_id", "rank")
    },

    // PER-DIMENSION EMBEDDING PROFILE — (dim, mn, mx, mean), the vector
    // dashboard before any ANN/quantization work and the statistics the
    // SQ8 fit reads. mn/mx are order-independent selections; the mean
    // runs the deterministic two-level vec_id%16 fold (the
    // pagerank/kmeans pattern — the oracle-exact mode; production swaps
    // a plain avg(), the pageRank exact=false trade).
    QueryDef.of("embedding_profile",
      """WITH x AS (
        |  SELECT e.vec_id, CAST(j.j - 1 AS BIGINT) AS dim,
        |    CAST(e.embedding[j.j] AS DOUBLE) AS v
        |  FROM embeddings e
        |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) j
        |), l1 AS (
        |  SELECT dim, vec_id % 16 AS bkt,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(vec_id := vec_id, v := v))),
        |        s -> s.v)), (a, b) -> a + b) AS bs,
        |    min(v) AS bmn, max(v) AS bmx, CAST(count(*) AS BIGINT) AS bn
        |  FROM x GROUP BY dim, vec_id % 16
        |)
        |SELECT dim, min(bmn) AS mn, max(bmx) AS mx,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(list_sort(list(struct_pack(bkt := bkt, bs := bs))),
        |      s -> s.bs)), (a, b) -> a + b)
        |    / CAST(sum(bn) AS DOUBLE) AS mean
        |FROM l1 GROUP BY dim ORDER BY dim""".stripMargin) { (s, dir) =>
      Similarity.embeddingProfile(Tables.embeddings(s, dir))
        .orderBy("dim")
    },

    // SCALAR QUANTIZATION (SQ8) ANN — the quantization family's fourth
    // point (LSH hyperplanes / IVF cells / PQ codebooks / per-dim affine
    // int8): a 4× thinner code scan with NO trained codebook. The fit is
    // two exact order-independent aggregates (per-dim min/max) and the
    // distance is all-integer, so — uniquely in the approximate family —
    // the OPERATING POINT ITSELF is oracle-certified on any corpus (no
    // exact sibling needed; recall vs true cosine is the measured trade,
    // reported in the stress block, not a correctness property).
    QueryDef.of("ann_topk_sq", annSqOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.buildSqIndex(emb)
      Similarity.sqTopK(emb.filter(col("vec_id") < 10), idx, k = 5)
        .orderBy("query_id", "rank")
    },

    // IVF-PQ — the composed billion-vector serving index (Jégou et al.
    // IVFADC shape, raw-vector codes): the inverted file prunes WHICH
    // candidates are scored (nProbe/nCells of the corpus), PQ prunes
    // WHAT is read to score them (m small ints, never the embedding).
    // Approximate by construction at this operating point → rows-only;
    // the composed machinery is oracle-certified by the _exact sibling.
    QueryDef.rowsOnly("ann_topk_ivfpq") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.buildIvfPqIndex(emb, nCells = 16, m = 8, ksub = 16)
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), idx, emb, k = 5,
          nProbe = 4, shortlist = 20)
        .orderBy("query_id", "rank")
    },

    // IVF-PQ at the EXACT operating point: nProbe = nCells probes every
    // cell (each vector lives in exactly one), shortlist ≥ corpus keeps
    // every candidate, and the rescore is exact cosine — ≡ brute force,
    // certifying the whole composition (shared-sample double quantizer
    // fit, fused cell+code encode, cell join, native ADC shortlist,
    // broadcast rescore) against the same DuckDB oracle as ann_topk
    // (the ivf_exact/pq_exact pattern, composed).
    QueryDef.of("ann_topk_ivfpq_exact", annTopkOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.buildIvfPqIndex(emb, nCells = 16, m = 8, ksub = 16)
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), idx, emb, k = 5,
          nProbe = 16, shortlist = 100000)
        .orderBy("query_id", "rank")
    },

    // RESIDUAL-coded IVF-PQ — classic IVFADC (Jégou et al. 2011 §IV-A):
    // codes quantize v − centroid(cell), spending the same m × ksub code
    // budget on what the coarse quantizer didn't explain. Implemented as
    // per-cell SHIFTED codebooks (‖v − (b + c)‖ = ‖(v − c) − b‖), so
    // NearestCells/PqAdcDistance are reused unchanged behind plan-constant
    // CASE dispatch — no HOF. Approximate at this operating point →
    // rows-only; certified by the _exact sibling.
    QueryDef.rowsOnly("ann_topk_ivfpq_res") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.buildIvfPqResIndex(emb, nCells = 16, m = 8, ksub = 16)
      Similarity.ivfPqResTopK(emb.filter(col("vec_id") < 10), idx, emb, k = 5,
          nProbe = 4, shortlist = 20)
        .orderBy("query_id", "rank")
    },

    // Residual IVF-PQ at the EXACT operating point: nProbe = nCells +
    // corpus-sized shortlist + exact rescore ≡ brute force (the
    // ivfpq_exact argument, unchanged by the codebook shift) — certifying
    // the residual composition (sample-residual sub-quantizer fit, shifted
    // per-cell codebooks, CASE-dispatched encode and ADC) against the same
    // DuckDB oracle as ann_topk.
    QueryDef.of("ann_topk_ivfpq_res_exact", annTopkOracle) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val idx = Similarity.buildIvfPqResIndex(emb, nCells = 16, m = 8, ksub = 16)
      Similarity.ivfPqResTopK(emb.filter(col("vec_id") < 10), idx, emb, k = 5,
          nProbe = 16, shortlist = 100000)
        .orderBy("query_id", "rank")
    },

    // Lloyd ASSIGNMENT step exposed as its own oracle row: the corpus
    // partitioned over 8 fixed centroids (the first 8 vectors — a
    // deterministic, SQL-replayable codebook), reported as per-cell size
    // + smallest member. This certifies the exact arithmetic the whole
    // IVF tier stands on — NearestCells' left-to-right Σ(x−c)² fold with
    // float→double widening and lowest-index tie-break — directly against
    // DuckDB replaying the same fold (list_reduce over a prepended 0.0,
    // (dist, cell) argmin), where ann_topk_ivf_exact could only certify
    // it indirectly (at nProbe = nCells the assignment cancels out).
    // Scale shape: ONE shuffle-free codegen'd scan for the assignment
    // (centroids are plan constants), then a partial-agg groupBy on an
    // 8-value key. The 8-row centroid collect is bounded, the IVF-build
    // pattern.
    QueryDef.of("kmeans_assign",
      kmeansAssignCte + """
        |SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(min(vec_id) AS BIGINT) AS min_vec
        |FROM asg GROUP BY cell ORDER BY cell""".stripMargin) {
      (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.assignCells(emb, fixedCentroids(emb))
        .groupBy(col("cell").cast("long").as("cell"))
        .agg(count(lit(1)).as("n_vectors"), min("vec_id").as("min_vec"))
        .orderBy("cell")
    },

    // K-MEANS LLOYD TRAINING (2 full mean-update rounds from the fixed
    // 8-vector seed, then the final assignment) — the TRAINED face of
    // kmeans_assign: centroids are no longer the raw seeds but exact
    // per-cell coordinate means, each (cell, dim) sum a deterministic
    // two-level vec_id%16 fold (the pagerank pattern), so the oracle
    // replays every round bit-for-bit: assignment argmin → salted l1
    // fold → bucket l2 fold → mean division → array rebuild in dim
    // order → next assignment. Engine-side the round means return as
    // one bounded 8×64 collect per round (NearestCells needs plan-time
    // constants — the IVF pattern); data-sized work per round is one
    // narrow scan + one (cell, dim) exchange. Every a/c level is
    // multiply-referenced → AS MATERIALIZED (the corenum lesson).
    QueryDef.of("kmeans_lloyd",
      lloydChain(2) + """,
        |af AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT q.vec_id, c.cell, row_number() OVER (
        |      PARTITION BY q.vec_id ORDER BY """.stripMargin +
        lloydDist("c") + """, c.cell) AS rn
          |    FROM q CROSS JOIN c2 c)
          |  WHERE rn = 1
          |)
          |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM af
          |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import graft.operators.Caches
      val emb = Caches.persistTracked(
        Tables.embeddings(s, dir).select("vec_id", "embedding"))
      Similarity.lloydTrain(emb, fixedCentroids(emb), rounds = 2)
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy("vec_id")
    },

    // K-MEANS TRAINING CERTIFIED TO IMPROVE ITS OBJECTIVE — the ascent
    // row (the graph_louvain_q pattern): global SSE under the raw seed
    // vs under the 2-round-trained centroids, both as deterministic
    // two-level folds, one row. At sf0.01 training cuts SSE 810.70 →
    // 467.21 (−42%; see SURVEY §8); the `improved` flag is computed
    // from the same two doubles on both engines.
    QueryDef.of("kmeans_lloyd_sse",
      lloydChain(2) + ",\n" + lloydSseBlock("c0", "s0") + ",\n" +
        lloydSseBlock("c2", "s2") + """
          |SELECT s0sse.sse AS sse_seed, s2sse.sse AS sse_trained,
          |  CAST(CASE WHEN s2sse.sse <= s0sse.sse THEN 1 ELSE 0 END AS BIGINT)
          |    AS improved
          |FROM s0sse CROSS JOIN s2sse""".stripMargin) { (s, dir) =>
      import graft.operators.Caches
      val emb = Caches.persistTracked(
        Tables.embeddings(s, dir).select("vec_id", "embedding"))
      val seeds = fixedCentroids(emb)
      val trained = Similarity.lloydCentroidsTrained(emb, seeds, rounds = 2)
      Similarity.sseUnder(emb, seeds).select(col("sse").as("sse_seed"))
        .crossJoin(Similarity.sseUnder(emb, trained)
          .select(col("sse").as("sse_trained")))
        .select(col("sse_seed"), col("sse_trained"),
          when(col("sse_trained") <= col("sse_seed"), 1L).otherwise(0L)
            .as("improved"))
    },

    // CLUSTER LABELING — the topic-naming step after clustering (the
    // top2vec/BERTopic pattern's first approximation): each k-means
    // cell's dominant token over its member documents (embeddings join
    // documents on the shared dense id domain — vec i embeds doc i).
    // The per-cell argmax is a partial-aggregated min_by under the
    // (−cnt, token) total order — NEVER a per-cell window (8 cells would
    // funnel the whole vocabulary through 8 tasks, the corpus_sample
    // skew rationale); the oracle's window runs over the per-(cell,
    // token) AGGREGATE, its affordance. Reuses kmeans_assign's certified
    // assignment CTE, so the two rows cannot drift.
    QueryDef.of("cluster_labels",
      kmeansAssignCte + """,
        |ct AS (
        |  SELECT asg.cell,
        |    unnest(string_split_regex(trim(d.text), '[ \t\n\x0B\f\r]+')) AS token
        |  FROM documents d JOIN asg ON d.doc_id = asg.vec_id
        |  WHERE d.text IS NOT NULL AND length(trim(d.text)) > 0
        |), cc AS (
        |  SELECT cell, token, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ct GROUP BY 1, 2
        |)
        |SELECT cell, token, cnt FROM (
        |  SELECT cell, token, cnt, row_number() OVER (
        |    PARTITION BY cell ORDER BY cnt DESC, token) AS rn
        |  FROM cc
        |) WHERE rn = 1 ORDER BY cell""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val assigned = Similarity.assignCells(emb, fixedCentroids(emb))
        .select(col("vec_id").as("doc_id"), col("cell").cast("long").as("cell"))
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .join(assigned, "doc_id")
        .select(col("cell"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("cell", "token").agg(count(lit(1)).as("cnt"))
        .groupBy("cell")
        .agg(min_by(struct(col("token"), col("cnt")),
          struct((-col("cnt")).as("nc"), col("token"))).as("w"))
        .select(col("cell"), col("w.token").as("token"), col("w.cnt").as("cnt"))
        .orderBy("cell")
    },

    // Hybrid retrieval: weighted LINEAR fusion of lexical and vector
    // scores — fused = 0.1·term_tf + cosine(embedding, query vector).
    // Per-row arithmetic only (no rank windows — reciprocal-rank fusion
    // would need a GLOBAL row_number, a single-task window at corpus
    // scale), so the plan is a broadcast of one query vector + a left
    // join of the tf aggregate + TakeOrderedAndProject top-10, and the
    // oracle mirrors every operation bit-for-bit (the native
    // CosineSimilarity is certified against DuckDB's
    // list_cosine_similarity by the ann_topk rows; rounding happens only
    // in the output projection, AFTER the top-10 selection on raw
    // doubles).
    QueryDef.of("hybrid_search",
      """WITH tf AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS term
        |    FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |  ) WHERE term IN ('hash', 'join', 'scan') GROUP BY doc_id
        |), qv AS (
        |  SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0
        |), scored AS (
        |  SELECT c.vec_id AS doc_id,
        |    CAST(COALESCE(tf.tf, 0) AS BIGINT) AS tf,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                           CAST(q.q_emb AS DOUBLE[])) AS cs
        |  FROM embeddings c CROSS JOIN qv q
        |  LEFT JOIN tf ON tf.doc_id = c.vec_id
        |  WHERE c.vec_id <> 0
        |)
        |SELECT doc_id, tf, round(cs, 4) AS cos_sim,
        |  round(CAST(tf AS DOUBLE) * 0.1 + cs, 4) AS score
        |FROM scored
        |ORDER BY CAST(tf AS DOUBLE) * 0.1 + cs DESC, doc_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      import graft.functions.VectorFunctions
      val tf = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term").isin("hash", "join", "scan"))
        .groupBy("doc_id").agg(count(lit(1)).as("tf"))
      val emb = Tables.embeddings(s, dir)
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      emb.filter(col("vec_id") =!= 0)
        .join(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          VectorFunctions.cosine(col("embedding"), col("q_emb")).as("cs"))
        .join(tf, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("tf"), lit(0L)).as("tf"),
          col("cs"))
        .withColumn("fused", col("tf").cast("double") * 0.1 + col("cs"))
        .orderBy(col("fused").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"), col("tf"),
          round(col("cs"), 4).as("cos_sim"),
          round(col("fused"), 4).as("score"))
    },

    // ----- text analysis -------------------------------------------------

    // Gopher-style repetition profiling: per doc the top-token and
    // top-bigram frequency fractions (the repetition-removal curation
    // signal). Operator groups on 64-bit native n-gram hashes; the oracle
    // recounts RAW strings, mirroring ShingleHashes' tokenization
    // (trim + explicit whitespace class; <= k tokens → one joined shingle)
    // — counts agree by injectivity, divisions mirrored op-for-op.
    QueryDef.of("text_repetition",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts FROM documents
        |), u1 AS (
        |  SELECT doc_id, unnest(CASE WHEN len(ts) <= 1 THEN [array_to_string(ts, ' ')]
        |    ELSE list_transform(generate_series(1, len(ts)), i -> ts[i]) END) AS t
        |  FROM toks
        |), c1 AS (SELECT doc_id, t, count(*) AS c FROM u1 GROUP BY 1, 2),
        |a1 AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(max(c) AS BIGINT) AS top_token_count
        |  FROM c1 GROUP BY 1
        |), u2 AS (
        |  SELECT doc_id, unnest(CASE WHEN len(ts) <= 2 THEN [array_to_string(ts, ' ')]
        |    ELSE list_transform(generate_series(1, len(ts) - 1),
        |                        i -> array_to_string(ts[i:i+1], ' ')) END) AS t
        |  FROM toks
        |), c2 AS (SELECT doc_id, t, count(*) AS c FROM u2 GROUP BY 1, 2),
        |a2 AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    CAST(max(c) AS BIGINT) AS m2
        |  FROM c2 GROUP BY 1
        |)
        |SELECT a1.doc_id, n_tokens, n_distinct, top_token_count,
        |  CAST(top_token_count AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_frac,
        |  n_bigrams,
        |  CAST(m2 AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac
        |FROM a1 JOIN a2 ON a1.doc_id = a2.doc_id
        |ORDER BY a1.doc_id""".stripMargin) { (s, dir) =>
      graft.operators.TextProfile.repetitionStats(
          Tables.documents(s, dir).select("doc_id", "text"))
        .orderBy("doc_id")
    },

    // CORPUS-level duplicated-span profile (Lee et al., "Deduplicating
    // Training Data Makes Language Models Better" — exact-substring dedup's
    // measurement step): per doc, how many of its distinct 3-token spans
    // also occur in ANOTHER document. text_repetition above is WITHIN-doc;
    // this is ACROSS-doc — the boilerplate / licence-header / syndication
    // signal curation thresholds on. The oracle recounts with RAW STRING
    // spans where the operator ships 64-bit hashes (the ngram_jaccard
    // injectivity argument); the dup_frac division is mirrored op-for-op
    // on raw doubles (single division, no rounding).
    QueryDef.of("dup_span_profile",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
        |         ELSE list_transform(generate_series(1, len(ts) - 2),
        |                             i -> array_to_string(ts[i:i+2], ' ')) END) AS s
        |  FROM toks
        |), ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |freq AS (SELECT g, CAST(count(*) AS BIGINT) AS nd FROM ex GROUP BY g),
        |spans AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_spans FROM sh),
        |dup AS (
        |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_dup
        |  FROM ex e JOIN freq ON e.g = freq.g WHERE freq.nd >= 2 GROUP BY 1
        |)
        |SELECT s.doc_id, s.n_spans,
        |  COALESCE(d.n_dup, CAST(0 AS BIGINT)) AS n_dup,
        |  CAST(COALESCE(d.n_dup, CAST(0 AS BIGINT)) AS DOUBLE)
        |    / CAST(s.n_spans AS DOUBLE) AS dup_frac
        |FROM spans s LEFT JOIN dup d USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      graft.operators.TextProfile.corpusDupSpans(
          Tables.documents(s, dir)
            .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
            .select("doc_id", "text"),
          k = 3)
        .orderBy("doc_id")
    },

    // EXACT-SUBSTRING DEDUP WITH REMOVAL — the transform dup_span_profile
    // only measures (Lee et al.'s actual deduplicate-training-data step):
    // every duplicated 3-token span keeps its min-(doc_id, pos) first
    // occurrence; later occurrences' token ranges are cut and each doc
    // re-emits its surviving tokens in position order. The oracle replays
    // the whole algorithm on RAW STRING spans where the engine ships
    // 64-bit hashes (the injectivity argument), with ALL-INTEGER
    // positions: span postings via DuckDB's parallel unnest (positions
    // zipped with spans), the keeper as the two-step lexicographic min
    // (min doc, then min pos within that doc — ≡ the engine's
    // min(struct(doc, pos))), removal ranges as generate_series, and the
    // reassembly as the lm_surprisal list_sort+list_transform fold. No
    // doubles anywhere — the output is integers and strings, so the hash
    // compare is exact by construction.
    QueryDef.of("dedup_span_rewrite",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), sh AS (
        |  SELECT doc_id, len(ts) AS n,
        |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
        |         ELSE list_transform(generate_series(1, len(ts) - 2),
        |                             i -> array_to_string(ts[i:i+2], ' ')) END AS gs
        |  FROM toks
        |), sp AS (
        |  SELECT doc_id, n, unnest(generate_series(1, len(gs))) AS pos,
        |         unnest(gs) AS g
        |  FROM sh
        |), freq AS (
        |  SELECT g, min(doc_id) AS kd FROM sp
        |  GROUP BY g HAVING count(*) >= 2
        |), k2 AS (
        |  SELECT sp.g AS g, f.kd AS kd, min(sp.pos) AS kpos
        |  FROM sp JOIN freq f ON sp.g = f.g AND sp.doc_id = f.kd
        |  GROUP BY sp.g, f.kd
        |), cut AS (
        |  SELECT sp.doc_id AS doc_id, sp.pos AS pos, sp.n AS n
        |  FROM sp JOIN k2 ON sp.g = k2.g
        |  WHERE NOT (sp.doc_id = k2.kd AND sp.pos = k2.kpos)
        |), rem AS (
        |  SELECT DISTINCT doc_id, pos FROM (
        |    SELECT doc_id,
        |      unnest(generate_series(pos, least(pos + 2, n))) AS pos
        |    FROM cut)
        |), tok AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ts))) AS pos,
        |         unnest(ts) AS t
        |  FROM toks
        |), kept AS (
        |  SELECT tok.doc_id AS doc_id, tok.pos AS pos, tok.t AS t
        |  FROM tok LEFT JOIN rem
        |    ON tok.doc_id = rem.doc_id AND tok.pos = rem.pos
        |  WHERE rem.doc_id IS NULL
        |), reb AS (
        |  SELECT doc_id, array_to_string(list_transform(
        |    list_sort(list(struct_pack(pos := pos, t := t))), s -> s.t),
        |    ' ') AS text_rewritten
        |  FROM kept GROUP BY doc_id
        |), rc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |  FROM rem GROUP BY doc_id
        |)
        |SELECT toks.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
        |  COALESCE(rc.n_removed, CAST(0 AS BIGINT)) AS n_removed,
        |  COALESCE(reb.text_rewritten, '') AS text_rewritten
        |FROM toks LEFT JOIN rc ON toks.doc_id = rc.doc_id
        |LEFT JOIN reb ON toks.doc_id = reb.doc_id
        |ORDER BY toks.doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Dedup.spanRewrite(
          Tables.documents(s, dir).select("doc_id", "text"), k = 3)
        .orderBy("doc_id")
    },

    // CCNet-style statistical quality score: per-doc mean unigram
    // surprisal under the corpus's OWN MLE unigram model — the
    // training-free stand-in for KenLM perplexity bucketing (head/middle/
    // tail). Integer aggregates everywhere; the one double fold runs over
    // the doc's term list SORTED by token, so the addition order is a
    // pure function of the data and the oracle replays it term-for-term
    // (list_sort + list_reduce, seed prepended — identical left fold).
    QueryDef.of("lm_surprisal",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), corpus AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
        |dt AS (
        |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS k FROM toks GROUP BY doc_id, t
        |), terms AS (
        |  SELECT d.doc_id,
        |    list_sort(list(struct_pack(t := d.t, k := d.k, c := c.c))) AS ts,
        |    CAST(sum(d.k) AS BIGINT) AS n_tokens
        |  FROM dt d JOIN corpus c ON d.t = c.t GROUP BY d.doc_id
        |)
        |SELECT doc_id, n_tokens,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(ts,
        |    s -> CAST(s.k AS DOUBLE) * ln(CAST(n_total AS DOUBLE) / CAST(s.c AS DOUBLE)))),
        |    (a, x) -> a + x) / CAST(n_tokens AS DOUBLE) AS surprisal
        |FROM terms CROSS JOIN tot
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.TextProfile.unigramSurprisal(
          Tables.documents(s, dir).select("doc_id", "text"))
        .orderBy("doc_id")
    },

    QueryDef.of("text_stats",
      """SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ts) END AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE list_sum(list_transform(ts,
        |              t -> greatest(1, CAST(ceil(length(t) / 6.0) AS BIGINT)))) END AS BIGINT) AS n_subwords,
        |  round(CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
        |        ELSE CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
        |             / CAST(len(ts) AS DOUBLE) END, 4) AS mean_tok_len,
        |  round(CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        |             / CAST(length(text) AS DOUBLE) END, 4) AS punct_ratio,
        |  round(CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
        |        ELSE CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS DOUBLE)
          |             / CAST(len(ts) AS DOUBLE) END, 4) AS stopword_ratio
          |FROM (SELECT doc_id, text, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import TextFunctions._
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens"),
          subwordCountEstimate(col("text")).as("n_subwords"),
          round(meanTokenLength(col("text")), 4).as("mean_tok_len"),
          round(punctRatio(col("text")), 4).as("punct_ratio"),
          round(stopwordRatio(col("text")), 4).as("stopword_ratio"))
        .orderBy("doc_id")
    },

    // Token counting both ways the brief names: whitespace tokens and a
    // BPE-ish regex pre-tokenizer (letter/digit/punct runs).
    QueryDef.of("token_counts",
      """SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) END AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import TextFunctions._
      Tables.documents(s, dir)
        .select(col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_ws"),
          bpeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")
    },

    // FLESCH READING-EASE scoring (Flesch 1948): 206.835 − 1.015·(words/
    // sentences) − 84.6·(syllables/words), with sentences counted as
    // [.!?]+ runs and syllables approximated as vowel-group runs (the
    // standard regex approximation; no per-word minimum — documented
    // simplification, same on both sides). All three inputs are exact
    // integers off ONE codegen'd scan (regexp_count runs — non-overlapping
    // leftmost matching in both engines); the formula is one fixed-order
    // double expression with every literal CAST AS DOUBLE in the oracle
    // (DuckDB folds bare decimals exactly; the JVM's binary doubles are
    // the repo-wide wire format — the pageRank lesson), so the score is
    // bit-equal with NO rounding. Divisions are greatest(·,1)-guarded.
    QueryDef.of("text_readability",
      """SELECT doc_id, n_words, n_sents, n_syll,
        |  CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE)
        |        / CAST(greatest(n_sents, 1) AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE) * (CAST(n_syll AS DOUBLE)
        |        / CAST(greatest(n_words, 1) AS DOUBLE)) AS flesch
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sents,
        |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syll
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val base = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_words"),
          regexp_count(col("text"), lit("[.!?]+")).cast("long").as("n_sents"),
          regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long")
            .as("n_syll"))
      base.select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
          (lit(206.835d)
            - lit(1.015d) * (col("n_words").cast("double")
                / greatest(col("n_sents"), lit(1L)).cast("double"))
            - lit(84.6d) * (col("n_syll").cast("double")
                / greatest(col("n_words"), lit(1L)).cast("double")))
            .as("flesch"))
        .orderBy("doc_id")
    },

    // TOKENIZER VOCABULARY COVERAGE — the curation question behind every
    // fixed-vocab tokenizer: what fraction of the corpus token stream does
    // a top-K frequency vocabulary cover (Zipf head mass)? One token-count
    // aggregate (map-side collapsed — the domain is the vocabulary, not
    // the stream), a TakeOrderedAndProject top-K (ties by token string —
    // total order), and two 1-row aggregates cross-joined; integers plus
    // ONE exact division. At 100 TB the only data-sized pass is the token
    // count; everything after runs on |vocab| rows.
    QueryDef.of("vocab_coverage",
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), tc AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t
        |), tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types FROM tc
        |), cov AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS covered FROM (
        |    SELECT c FROM tc ORDER BY c DESC, t LIMIT 1000)
        |)
        |SELECT n_tokens, n_types, covered,
        |  CAST(covered AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage
        |FROM tot CROSS JOIN cov ORDER BY n_tokens""".stripMargin) { (s, dir) =>
      import graft.operators.Caches
      // the vocab count feeds BOTH closing aggregates — tracked persist so
      // the token explode runs once (released by the caller's releaseAll)
      val tc = Caches.persistTracked(Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c")))
      val tot = tc.agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"))
      val cov = tc.orderBy(col("c").desc, col("t")).limit(1000)
        .agg(sum("c").as("covered"))
      tot.crossJoin(cov)
        .select(col("n_tokens"), col("n_types"), col("covered"),
          (col("covered").cast("double") / col("n_tokens").cast("double"))
            .as("coverage"))
        .orderBy("n_tokens")
    },

    // Corpus-wide top word bigrams — the collocation census (the n-gram
    // LM / phrase-mining first pass). Token positions explode once into
    // a tracked-persisted frame; adjacency is a co-partitioned
    // SELF-EQUI-JOIN on (doc_id, position) — no HOF over token arrays,
    // no per-doc window — and the bigram count partial-aggregates
    // map-side. All-integer, ties at the top-20 cut broken by the ngram
    // string → a total order → TakeOrderedAndProject.
    QueryDef.of("top_ngrams",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), bi AS (
        |  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
        |    i -> ts[i] || ' ' || ts[i + 1])) AS ngram
        |  FROM toks WHERE len(ts) >= 2
        |)
        |SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
        |FROM bi GROUP BY ngram
        |ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin) { (s, dir) =>
      import graft.operators.Caches
      val toks = Caches.persistTracked(Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "w"))))
      toks.as("a")
        .join(toks.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.pos") === col("a.pos") + 1)
        .select(concat_ws(" ", col("a.w"), col("b.w")).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("ngram"))
        .limit(20)
    },

    // BPE vocabulary induction, step one: the top adjacent character-pair
    // counts over the whitespace-token stream — exactly the statistic the
    // first byte-pair-encoding merge maximizes (Sennrich et al.; counts
    // within tokens only, as BPE never merges across word boundaries).
    // All-integer, so the oracle is exact; ties at the cut are broken by
    // the pair string, making the top-20 a total order. Plan shape: the
    // pair domain is bounded (≤ charset², thousands), so partial
    // aggregation collapses the per-token explode BEFORE the shuffle —
    // at 100 TB each partition ships at most |domain| rows — and ranking
    // is TakeOrderedAndProject (PlanSpec-pinned), never a global sort.
    // The position explode is a native sequence() + substr on column
    // args — no lambda in the plan.
    QueryDef.of("bpe_pairs",
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), pairs AS (
        |  SELECT unnest(list_transform(generate_series(1, length(t) - 1),
        |                               i -> substr(t, CAST(i AS INTEGER), 2))) AS pair
        |  FROM toks WHERE length(t) >= 2
        |)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair
        |LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(explode(TextFunctions.tokens(col("text"))).as("t"))
        .filter(length(col("t")) >= 2)
        .select(col("t"), explode(sequence(lit(1), length(col("t")) - 1)).as("i"))
        .select(col("t").substr(col("i"), lit(2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },

    // ITERATIVE BPE merges — the full Sennrich et al. vocabulary-induction
    // loop (bpe_pairs is its step 1): 6 merge steps, each counting adjacent
    // symbol pairs over the distinct-word table, merging the argmax pair
    // (ties by (lhs, rhs) string order — every step deterministic) and
    // re-segmenting via native left-to-right `replace` (= BPE's greedy
    // merge). All-integer counts + deterministic tie-breaks, so the oracle
    // replays the WHOLE loop op-for-op as a 6-level CTE chain: same
    // segmentation strings, same argmax per level, same merge table.
    // Scale shape in TextProfile.bpeMerges' scaladoc (Zipf-bounded word
    // table, partial-agg pair counts, 1-row argmax collects).
    QueryDef.of("bpe_merges", bpeMergesOracle(6)) { (s, dir) =>
      graft.operators.TextProfile.bpeMerges(Tables.documents(s, dir), k = 6)
        .orderBy("step")
    },

    // The learned vocabulary APPLIED: per doc, whitespace token count vs
    // token count under the 6-merge BPE segmentation — the trainer-facing
    // sequence length. Same distinct-word merge loop as bpe_merges, then
    // one symbol-count equi-join onto the doc→word stream (text is never
    // re-segmented per document). Integer outputs; the oracle closes the
    // shared CTE chain with the same join.
    QueryDef.of("bpe_encode", bpeEncodeOracle(6)) { (s, dir) =>
      graft.operators.TextProfile.bpeEncode(Tables.documents(s, dir), k = 6)
        .orderBy("doc_id")
    },

    // Composite quality score per document — oracle mirrors the exact
    // weighted-sum formula (same term order, so doubles match bitwise;
    // deliberately unrounded, see TextFunctions.qualityScore).
    QueryDef.of("text_quality",
      """SELECT doc_id,
        |  least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ts) END AS DOUBLE) / 50.0, 1.0) * 0.3
        |    + least((CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
        |             ELSE CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS DOUBLE)
          |                  / CAST(len(ts) AS DOUBLE) END) * 5.0, 1.0) * 0.3
          |    + (CASE WHEN (CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
          |                  ELSE CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
          |                       / CAST(len(ts) AS DOUBLE) END) BETWEEN 3.0 AND 10.0
          |            THEN 1.0 ELSE 0.5 END) * 0.2
          |    + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
          |        ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
          |             / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.2 AS quality
          |FROM (SELECT doc_id, text, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    },

    // GOPHER RULE FILTER (Rae et al. 2021 App. A1.1) — the deterministic
    // rule-based document filter, one 0/1 column per rule plus the
    // conjunction (the auditable-funnel shape). All thresholds are integer
    // cross-multiplications — no doubles anywhere, so the oracle is exact
    // on any corpus. See TextProfile.gopherRules for the rule list and the
    // one-scan/no-shuffle scale argument. At sf0.01: 345/500 docs pass
    // (word-count cuts 43, stopwords 112).
    QueryDef.of("gopher_rules",
      """WITH b AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0B\f\r]+') END AS ts
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(ts, t -> length(t))), 0) AS BIGINT) AS sl,
        |    CAST(len(list_filter(ts, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS na,
        |    CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS BIGINT) AS nsw,
          |    CAST(len(regexp_extract_all(text, '#+|\.\.\.')) AS BIGINT) AS nsym
          |  FROM b
          |), r AS (
          |  SELECT doc_id, n_words,
          |    CASE WHEN n_words >= 10 AND n_words <= 90 THEN 1 ELSE 0 END AS p1,
          |    CASE WHEN 3 * n_words <= sl AND sl <= 10 * n_words THEN 1 ELSE 0 END AS p2,
          |    CASE WHEN 5 * na >= 4 * n_words THEN 1 ELSE 0 END AS p3,
          |    CASE WHEN 10 * nsym <= n_words THEN 1 ELSE 0 END AS p4,
          |    CASE WHEN nsw >= 2 THEN 1 ELSE 0 END AS p5
          |  FROM m
          |)
          |SELECT doc_id, n_words,
          |  CAST(p1 AS BIGINT) AS pass_word_count,
          |  CAST(p2 AS BIGINT) AS pass_mean_word_len,
          |  CAST(p3 AS BIGINT) AS pass_alpha_words,
          |  CAST(p4 AS BIGINT) AS pass_symbol_ratio,
          |  CAST(p5 AS BIGINT) AS pass_stopwords,
          |  CAST(p1 * p2 * p3 * p4 * p5 AS BIGINT) AS pass
          |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.TextProfile.gopherRules(Tables.documents(s, dir))
        .orderBy("doc_id")
    },

    // TRAINED QUALITY CLASSIFIER (multinomial naive Bayes) — the
    // GPT-3/CCNet distillation pattern: derive a binary quality tier from
    // the composite heuristic score on a TRAIN split (doc_id % 5 ≠ 0),
    // fit per-class token statistics, predict the TEST split. The label
    // is token-visible (stopword density drives the heuristic), so the
    // classifier genuinely learns: 70% test accuracy vs the 57% majority
    // baseline at sf0.01. The oracle replays the ENTIRE train+score
    // pipeline (counts, Laplace smoothing, token-ordered ln folds, the
    // (score DESC, label) argmax) op-for-op — exact on any corpus. The
    // lang column is deliberately NOT the target: this corpus's language
    // labels are drawn independently of its word salad (langid_confusion
    // documents that), so lang prediction certifies nothing.
    QueryDef.of("quality_classifier",
      """WITH d0 AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, text,
        |    CASE WHEN
        |      least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ts) END AS DOUBLE) / 50.0, 1.0) * 0.3
        |      + least((CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
        |               ELSE CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS DOUBLE)
          |                    / CAST(len(ts) AS DOUBLE) END) * 5.0, 1.0) * 0.3
          |      + (CASE WHEN (CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
          |                    ELSE CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
          |                         / CAST(len(ts) AS DOUBLE) END) BETWEEN 3.0 AND 10.0
          |              THEN 1.0 ELSE 0.5 END) * 0.2
          |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
          |          ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
          |               / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.2
          |      >= CAST(0.75 AS DOUBLE) THEN 'hi' ELSE 'lo' END AS label,
          |    doc_id % 5 <> 0 AS tr
          |  FROM d0
          |), toks AS (
          |  SELECT doc_id, label, tr, t, CAST(count(*) AS BIGINT) AS k
          |  FROM (SELECT doc_id, label, tr,
          |          unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS t
          |        FROM d WHERE length(trim(text)) > 0)
          |  GROUP BY 1, 2, 3, 4
          |), ndc AS (SELECT label, CAST(count(*) AS BIGINT) AS ndc FROM d WHERE tr GROUP BY label),
          |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d WHERE tr),
          |tc AS (SELECT label, t, CAST(sum(k) AS BIGINT) AS c FROM toks WHERE tr GROUP BY 1, 2),
          |ncl AS (SELECT label, CAST(sum(c) AS BIGINT) AS ncl FROM tc GROUP BY label),
          |vv AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM toks WHERE tr),
          |cls AS (SELECT ndc.label, ndc.ndc, ncl.ncl, nt.n, vv.v
          |        FROM ndc JOIN ncl ON ndc.label = ncl.label CROSS JOIN nt CROSS JOIN vv),
          |vocab AS (SELECT DISTINCT t FROM tc),
          |tt AS (SELECT toks.doc_id, toks.t, toks.k FROM toks
          |       JOIN vocab ON toks.t = vocab.t WHERE NOT toks.tr),
          |rws AS (
          |  SELECT tt.doc_id, cls.label, tt.t, tt.k,
          |    CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / CAST(cls.ncl + cls.v AS DOUBLE) AS p
          |  FROM tt CROSS JOIN cls
          |  LEFT JOIN tc ON tc.t = tt.t AND tc.label = cls.label
          |), folds AS (
          |  SELECT doc_id, label,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list_transform(list_sort(list(struct_pack(t := t, k := k, p := p))),
          |        s -> CAST(s.k AS DOUBLE) * ln(s.p))), (a, x) -> a + x) AS ll
          |  FROM rws GROUP BY doc_id, label
          |), scored AS (
          |  SELECT td.doc_id, cls.label,
          |    ln(CAST(cls.ndc AS DOUBLE) / CAST(cls.n AS DOUBLE))
          |      + coalesce(f.ll, CAST(0.0 AS DOUBLE)) AS score
          |  FROM (SELECT doc_id FROM d WHERE NOT tr) td CROSS JOIN cls
          |  LEFT JOIN folds f ON f.doc_id = td.doc_id AND f.label = cls.label
          |), pick AS (
          |  SELECT doc_id, label AS pred, score,
          |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
          |  FROM scored
          |)
          |SELECT p.doc_id, d.label, p.pred, p.score,
          |  CAST(CASE WHEN d.label = p.pred THEN 1 ELSE 0 END AS BIGINT) AS correct
          |FROM pick p JOIN d ON p.doc_id = d.doc_id
          |WHERE p.rn = 1
          |ORDER BY p.doc_id""".stripMargin) { (s, dir) =>
      // checkpoint leaf (r15): the labeled frame is consumed by the
      // classifier AND the final label join — unmaterialized, each
      // consumer re-ran the regex-heavy quality score over the full scan
      val labeled = graft.operators.Caches.checkpointTracked(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"),
            when(TextFunctions.qualityScore(col("text")) >= lit(0.75d), "hi")
              .otherwise("lo").as("label")))
      graft.operators.Classify.multinomialNb(labeled, "label",
          isTrain = col("doc_id") % 5 =!= 0)
        .join(labeled.select("doc_id", "label"), "doc_id")
        .select(col("doc_id"), col("label"), col("pred"), col("score"),
          when(col("label") === col("pred"), 1L).otherwise(0L).as("correct"))
        .orderBy("doc_id")
    },

    // THE GOPHER FUNNEL — gopher_rules' dashboard view (the
    // curation_funnel idiom): survivors after each rule applied
    // CUMULATIVELY in declaration order, all integer, ONE scan + one
    // 1-row aggregate stacked into (ord, stage, n_pass) rows.
    QueryDef.of("gopher_funnel",
      """WITH b AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(coalesce(text, '')), '[ \t\n\x0B\f\r]+') END AS ts
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS nw,
        |    CAST(coalesce(list_sum(list_transform(ts, t -> length(t))), 0) AS BIGINT) AS sl,
        |    CAST(len(list_filter(ts, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS na,
        |    CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS BIGINT) AS nsw,
          |    CAST(len(regexp_extract_all(text, '#+|\.\.\.')) AS BIGINT) AS nsym
          |  FROM b
          |), r AS (
          |  SELECT doc_id,
          |    CASE WHEN nw >= 10 AND nw <= 90 THEN 1 ELSE 0 END AS p1,
          |    CASE WHEN 3 * nw <= sl AND sl <= 10 * nw THEN 1 ELSE 0 END AS p2,
          |    CASE WHEN 5 * na >= 4 * nw THEN 1 ELSE 0 END AS p3,
          |    CASE WHEN 10 * nsym <= nw THEN 1 ELSE 0 END AS p4,
          |    CASE WHEN nsw >= 2 THEN 1 ELSE 0 END AS p5
          |  FROM m
          |), agg AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n0,
          |    CAST(sum(p1) AS BIGINT) AS n1,
          |    CAST(sum(p1 * p2) AS BIGINT) AS n2,
          |    CAST(sum(p1 * p2 * p3) AS BIGINT) AS n3,
          |    CAST(sum(p1 * p2 * p3 * p4) AS BIGINT) AS n4,
          |    CAST(sum(p1 * p2 * p3 * p4 * p5) AS BIGINT) AS n5
          |  FROM r
          |)
          |SELECT * FROM (
          |  SELECT CAST(0 AS BIGINT) AS ord, 'total' AS stage, n0 AS n_pass FROM agg
          |  UNION ALL SELECT 1, 'word_count', n1 FROM agg
          |  UNION ALL SELECT 2, 'mean_word_len', n2 FROM agg
          |  UNION ALL SELECT 3, 'alpha_words', n3 FROM agg
          |  UNION ALL SELECT 4, 'symbol_ratio', n4 FROM agg
          |  UNION ALL SELECT 5, 'stopwords', n5 FROM agg
          |) ORDER BY ord""".stripMargin) { (s, dir) =>
      val g = graft.operators.TextProfile.gopherRules(Tables.documents(s, dir))
      g.agg(count(lit(1)).as("n0"),
          sum("pass_word_count").as("n1"),
          sum(col("pass_word_count") * col("pass_mean_word_len")).as("n2"),
          sum(col("pass_word_count") * col("pass_mean_word_len") *
            col("pass_alpha_words")).as("n3"),
          sum(col("pass_word_count") * col("pass_mean_word_len") *
            col("pass_alpha_words") * col("pass_symbol_ratio")).as("n4"),
          sum(col("pass")).as("n5"))
        .selectExpr("""stack(6,
          |  CAST(0 AS BIGINT), 'total', n0,
          |  CAST(1 AS BIGINT), 'word_count', n1,
          |  CAST(2 AS BIGINT), 'mean_word_len', n2,
          |  CAST(3 AS BIGINT), 'alpha_words', n3,
          |  CAST(4 AS BIGINT), 'symbol_ratio', n4,
          |  CAST(5 AS BIGINT), 'stopwords', n5) AS (ord, stage, n_pass)""".stripMargin)
        .orderBy("ord")
    },

    // DSIR IMPORTANCE RESAMPLING (Xie et al. 2023): select the 100 raw
    // documents whose hashed-ngram profile best matches the TARGET
    // distribution (here: the English subcorpus) under the smoothed
    // unigram log importance ratio. The oracle replays the ENTIRE
    // pipeline — portable shingle hashes (the dedup_simhash_scale folds),
    // 1024-way bucketing, Laplace-smoothed per-bucket log ratios, the
    // bucket-ordered per-doc fold, the (weight DESC, doc_id) top-100 —
    // op-for-op, so the row is exact on any corpus at any SF (no
    // separation assumption). See operators/Dsir.scala for the B-row
    // broadcast / one-scan scale shape.
    QueryDef.of("dsir_select",
      dsirChain + """
        |SELECT d.doc_id, d.lang, s.weight
        |FROM sel s JOIN documents d ON s.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.operators.Dsir.select(docs.select("doc_id", "text", "lang"),
          isTarget = col("lang") === "en", buckets = 1024, n = 100)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "weight")
        .orderBy("doc_id")
    },

    // DID DSIR WORK? — the selection's effect certified as one row (the
    // kmeans_lloyd_sse ascent pattern): KL(raw || target) vs
    // KL(selected || target) over the hashed-feature buckets, Laplace-
    // smoothed on the raw bucket domain (selected and target are subsets
    // of raw -> every p positive, both KLs finite), terms folded in
    // bucket order through ieee_ln. Selection moves the distribution
    // toward the target: KL 0.0166 -> 0.0035 at sf0.01, 0.0204 -> 0.0012
    // at sf0.001 (see SURVEY §8).
    QueryDef.of("dsir_shift",
      dsirChain + """,
        |sf2 AS (
        |  SELECT f.bucket, CAST(sum(f.k) AS BIGINT) AS cs
        |  FROM feats f JOIN sel ON f.doc_id = sel.doc_id GROUP BY f.bucket
        |), j AS (
        |  SELECT rf.bucket, rf.cr,
        |    coalesce(tf.ct, 0) AS ct, coalesce(sf2.cs, 0) AS cs
        |  FROM rf LEFT JOIN tf ON rf.bucket = tf.bucket
        |          LEFT JOIN sf2 ON rf.bucket = sf2.bucket
        |), tot2 AS (
        |  SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt,
        |    CAST(sum(cs) AS BIGINT) AS ns FROM j
        |), terms AS (
        |  SELECT j.bucket,
        |    (CAST(j.cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE))
        |      * ln((CAST(j.cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE))
        |            / (CAST(j.ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE))) AS t_raw,
        |    (CAST(j.cs + 1 AS DOUBLE) / CAST(ns + 1024 AS DOUBLE))
        |      * ln((CAST(j.cs + 1 AS DOUBLE) / CAST(ns + 1024 AS DOUBLE))
        |            / (CAST(j.ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE))) AS t_sel
        |  FROM j CROSS JOIN tot2
        |), kls AS (
        |  SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(bucket := bucket, t := t_raw))),
        |        s -> s.t)), (a, x) -> a + x) AS kl_raw,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(bucket := bucket, t := t_sel))),
        |        s -> s.t)), (a, x) -> a + x) AS kl_selected
        |  FROM terms
        |)
        |SELECT kl_raw, kl_selected,
        |  CAST(CASE WHEN kl_selected <= kl_raw THEN 1 ELSE 0 END AS BIGINT)
        |    AS improved
        |FROM kls""".stripMargin) { (s, dir) =>
      graft.operators.Dsir.distributionShift(
        Tables.documents(s, dir).select("doc_id", "text", "lang"),
        isTarget = col("lang") === "en", buckets = 1024, n = 100)
    },

    // PER-SOURCE KL DIVERGENCE from the corpus unigram blend — the
    // mixture-reweighting profile (DoReMi's "how distinctive is this
    // domain" number). No smoothing: the sum ranges over the source's
    // own tokens, all present in the corpus — finite and >= 0 by
    // construction. ieee_ln + token-ordered folds -> exact oracle.
    QueryDef.of("corpus_divergence",
      """WITH toks AS (
        |  SELECT source AS g,
        |    unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), st AS (
        |  SELECT g, t, CAST(count(*) AS BIGINT) AS cst FROM toks GROUP BY 1, 2
        |), ns AS (
        |  SELECT g, CAST(sum(cst) AS BIGINT) AS ns,
        |    CAST(count(*) AS BIGINT) AS nd
        |  FROM st GROUP BY g
        |), ct AS (SELECT t, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |terms AS (
        |  SELECT st.g, st.t,
        |    (CAST(st.cst AS DOUBLE) / CAST(ns.ns AS DOUBLE))
        |      * ln((CAST(st.cst AS DOUBLE) / CAST(ns.ns AS DOUBLE))
        |            / (CAST(ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))) AS term
        |  FROM st JOIN ct ON st.t = ct.t JOIN ns ON st.g = ns.g CROSS JOIN n
        |), kl AS (
        |  SELECT g,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_sort(list(struct_pack(t := t, term := term))),
        |        s -> s.term)), (a, x) -> a + x) AS kl
        |  FROM terms GROUP BY g
        |)
        |SELECT ns.g AS source, ns.ns AS n_tokens, ns.nd AS n_distinct, kl.kl
        |FROM ns JOIN kl ON ns.g = kl.g
        |ORDER BY source""".stripMargin) { (s, dir) =>
      graft.operators.TextProfile.sourceDivergence(Tables.documents(s, dir))
        .orderBy("source")
    },

    // PII-style scrubbing: regex redaction as a pure columnar transform
    // (the curation step that runs before anything else touches a crawl).
    // Patterns kept to syntax shared by Java regex and RE2 so the oracle
    // is exact.
    QueryDef.of("text_scrub",
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9][0-9][0-9]+', '<NUM>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("text"), "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
            "[0-9][0-9][0-9]+", "<NUM>").as("scrubbed"))
        .orderBy("doc_id")
    },

    // Corpus length histogram: 50-char buckets — the shape check every
    // curation run starts with.
    QueryDef.of("doc_length_hist",
      """SELECT CAST(n_chars // 50 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy((col("n_chars") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min("n_chars").cast("long").as("min_chars"),
          max("n_chars").cast("long").as("max_chars"))
        .orderBy("bucket")
    },

    // Language-ID distribution. Tie-break: highest score, then
    // lexicographically-later language (struct-max in Spark ≡ the
    // descending-lex CASE cascade in the oracle).
    QueryDef.of("lang_id_dist",
      langPredCte + """
        |SELECT lang_pred, CAST(count(*) AS BIGINT) AS cnt
        |FROM sel GROUP BY lang_pred ORDER BY lang_pred""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang_pred")
    },

    // Lang-ID CONFUSION MATRIX — the classifier EVALUATED against the
    // corpus's ground-truth `lang` column (the model-eval view of the
    // component lang_id_dist only profiles): (truth, prediction, count)
    // cells, all integer. One scan + a |langs|²-bounded partial-agg
    // groupBy; per-class precision/recall derive from the cells
    // downstream. The oracle joins the same replayed heuristic back to
    // the truth column.
    QueryDef.of("langid_confusion",
      langPredCte + """
        |SELECT d.lang, s.lang_pred, CAST(count(*) AS BIGINT) AS cnt
        |FROM sel s JOIN documents d ON s.doc_id = d.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "lang_pred")
    },

    // Stratified corpus sampling — the curation step after scoring: keep
    // the top-10 quality docs PER LANGUAGE. Runs through the bounded
    // partial-aggregated TopKAggregator, NOT a per-key window: language
    // cardinality is tiny (≤6), so `row_number over (partition by lang)`
    // would funnel the whole corpus through ≤6 tasks — the exact skew the
    // engine's no-per-key-window rule exists to avoid. The aggregator
    // ships ≤10 rows per partition per language instead. Exact oracle:
    // quality is the bit-mirrored weighted sum (see text_quality) and
    // lang the bit-mirrored marker argmax (see lang_id_dist), so ranking
    // by (quality DESC, doc_id) is deterministic and identical in DuckDB.
    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis-Spirakis A-ES):
    // top-100 by the exponential key ln(u)/w — u a MINSTD uniform drawn
    // from the doc's own id (exact integer arithmetic), w = n_chars, the
    // ln through ieee_ln — so the oracle replays the draw bit-for-bit.
    // Inclusion probability ∝ weight, no coordination, one narrow map +
    // one TakeOrderedAndProject (see CorpusMix.weightedSample).
    QueryDef.of("corpus_sample_weighted",
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    ln(CAST(((doc_id % 2147483647) * 48271) % 2147483647 + 1 AS DOUBLE)
        |       / CAST(2147483648 AS DOUBLE)) / CAST(n_chars AS DOUBLE) AS es_key
        |  FROM documents
        |), sel AS (
        |  SELECT doc_id, n_chars, es_key FROM k
        |  ORDER BY es_key DESC, doc_id LIMIT 100
        |)
        |SELECT doc_id, n_chars, es_key FROM sel ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
      graft.operators.CorpusMix.weightedSample(
          Tables.documents(s, dir), idCol = "doc_id", weightCol = "n_chars",
          n = 100)
        .orderBy("doc_id")
    },

    QueryDef.of("corpus_sample",
      """WITH base AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts,
        |    ' ' || lower(text) || ' ' AS p
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id,
        |    least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ts) END AS DOUBLE) / 50.0, 1.0) * 0.3
        |      + least((CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
        |               ELSE CAST(len(list_filter(ts, t -> list_contains(""".stripMargin +
        stopwordsSqlList +
        """, t))) AS DOUBLE)
          |                    / CAST(len(ts) AS DOUBLE) END) * 5.0, 1.0) * 0.3
          |      + (CASE WHEN (CASE WHEN length(trim(text)) = 0 OR len(ts) = 0 THEN 0.0
          |                    ELSE CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
          |                         / CAST(len(ts) AS DOUBLE) END) BETWEEN 3.0 AND 10.0
          |              THEN 1.0 ELSE 0.5 END) * 0.2
          |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
          |          ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
          |               / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.2 AS quality,
          |    (CASE WHEN contains(p, ' the ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' and ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' of ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, 'ing ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' is ') THEN 1 ELSE 0 END) AS s_en,
          |    (CASE WHEN contains(p, ' der ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' und ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' die ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, 'sch') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' ist ') THEN 1 ELSE 0 END) AS s_de,
          |    (CASE WHEN contains(p, ' le ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' la ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' et ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' les ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' est ') THEN 1 ELSE 0 END) AS s_fr,
          |    (CASE WHEN contains(p, ' el ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' que ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' los ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' una ') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, ' es ') THEN 1 ELSE 0 END) AS s_es,
          |    (CASE WHEN contains(p, '的') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, '了') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, '是') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, '我') THEN 1 ELSE 0 END) +
          |    (CASE WHEN contains(p, '不') THEN 1 ELSE 0 END) AS s_zh
          |  FROM base
          |), sel AS (
          |  SELECT doc_id, quality, CASE
          |    WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
          |    WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
          |    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
          |    WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
          |    WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
          |    ELSE 'de' END AS lang_pred
          |  FROM scored WHERE quality IS NOT NULL
          |)
          |SELECT lang_pred, rank, doc_id, quality FROM (
          |  SELECT lang_pred, doc_id, quality,
          |    CAST(row_number() OVER (PARTITION BY lang_pred
          |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
          |  FROM sel)
          |WHERE rank <= 10
          |ORDER BY lang_pred, rank""".stripMargin) { (s, dir) =>
      import graft.operators.TopK
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.langId(col("text")).as("lang_pred"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .filter(col("quality").isNotNull)
        .groupBy("lang_pred")
        .agg(TopK.topK(10)(col("doc_id"), col("quality")).as("nn"))
        .select(col("lang_pred"), posexplode(col("nn")).as(Seq("pos", "s")))
        .select(col("lang_pred"), (col("pos") + 1).cast("long").as("rank"),
          col("s.neighbor_id").as("doc_id"),
          // deliberately unrounded — see qualityScore's scaladoc
          col("s.cos").as("quality"))
        .orderBy("lang_pred", "rank")
    },

    // Deterministic weighted corpus mixing (the training-data "recipe"
    // step): keep 25% of src0, 50% of src1, 0% of src2, 100% of the rest —
    // decided by fingerprint(text) % 10000 against plan-time integer
    // thresholds. The fingerprint is the engine-portable fold the
    // doc_fingerprint oracle replicates, so the EXACT membership of the
    // mix is oracle-checked, not just its size.
    QueryDef.of("corpus_mix",
      """WITH fp AS (
        |  SELECT doc_id, source, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE list_reduce(
        |      list_prepend(CAST(0 AS BIGINT), list_transform(
        |        string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
        |        t -> list_reduce(
        |               list_prepend(CAST(17 AS BIGINT), list_transform(
        |                 generate_series(1, length(t)),
        |                 i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
        |               (h, c) -> (h * 31 + c) % 2147483647))),
        |      (h, th) -> (h * 1000003 + th) % 2147483647)
        |    END AS fp
        |  FROM documents
        |)
        |SELECT doc_id, source, lang FROM fp
        |WHERE fp % 10000 < CASE source WHEN 'src0' THEN 2500
        |                               WHEN 'src1' THEN 5000
        |                               WHEN 'src2' THEN 0
        |                               ELSE 10000 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.CorpusMix.sampleByStratum(
          Tables.documents(s, dir), "source",
          Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.0))
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    },

    // LENGTH-GROUPED BATCHING profile — the dynamic-batching efficiency
    // question (padding waste is pure compute thrown away when batches
    // pad to their longest member): bucket docs by token count (width
    // 32), report per-bucket size, length range, and the exact padding
    // waste n_docs·max − Σtokens IF batches were cut along buckets. All
    // integers off one partial-aggregated pass over the native token
    // counter; bucket domain is bounded by max doc length / 32. The
    // smaller the per-bucket (max − min) spread, the better
    // length-grouping amortizes — the report a trainer tunes bucket
    // width against.
    QueryDef.of("batch_buckets",
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'))
        |         END AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT CAST(n // 32 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(n) AS BIGINT) AS min_tokens,
        |  CAST(max(n) AS BIGINT) AS max_tokens,
        |  CAST(max(n) * count(*) - sum(n) AS BIGINT) AS padding_waste
        |FROM t GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull)
        .select(TextFunctions.tokenCount(col("text")).cast("long").as("n"))
        .groupBy((col("n") / 32).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min("n").as("min_tokens"), max("n").as("max_tokens"),
          (max("n") * count(lit(1)) - sum("n")).as("padding_waste"))
        .orderBy("bucket")
    },

    // TEMPERATURE-SCALED source weights (α = 0.5; XLM / mT5 multilingual
    // rebalancing): q_i ∝ √p_i flattens the source head — low-resource
    // strata get boost > 1, dominant ones < 1 — the numbers a sampler
    // (corpus_mix's rate map) is then CONFIGURED with. Exponent fixed at
    // √ (correctly rounded IEEE — a general pow() diverges by ulps
    // across libm, the lm_bigram ln lesson); the Σ√p normalizer is a
    // sorted fold; the two 1-row frames broadcast onto the ≤|strata|-row
    // stratum frame (bounded products, allowlisted).
    QueryDef.of("corpus_temperature",
      """WITH c AS (
        |  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1
        |), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
        |p AS (
        |  SELECT stratum, n_docs,
        |    CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS p
        |  FROM c CROSS JOIN tot
        |), z AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(list_sort(list(struct_pack(stratum := stratum,
        |                                              v := sqrt(p)))),
        |                   x -> x.v)),
        |    (a, x) -> a + x) AS z
        |  FROM p
        |)
        |SELECT stratum, n_docs, p, sqrt(p) / z AS q,
        |  (sqrt(p) / z) / p AS boost
        |FROM p CROSS JOIN z ORDER BY stratum""".stripMargin) { (s, dir) =>
      graft.operators.CorpusMix
        .temperatureWeights(Tables.documents(s, dir), "source")
        .orderBy("stratum")
    },

    // THE COMPOSED CURATION PIPELINE — the flagship end-to-end recipe a
    // training-data user actually runs, as ONE oracle-checked unit:
    //   quality filter (>= 0.5, bit-mirrored weighted sum)
    //   → exact-dedup survivors (min doc_id per text, within the filtered set)
    //   → STRICT decontamination (drop benchmark members and anything
    //     sharing a 3-shingle with the eval corpus = every 7th doc_id)
    //   → deterministic weighted mix (25% src0 / 50% src1 / 0% src2).
    // Every stage's arithmetic is already individually oracle-certified
    // (text_quality, dedup_exact, decontaminate, corpus_mix); this row
    // certifies that the operators COMPOSE exactly — thresholds compare
    // doubles both engines computed op-for-op identically, memberships are
    // set-exact, so the final doc_id set hash-matches.
    QueryDef.of("curation_pipeline",
      curationCte(false) + """
        |SELECT doc_id, source, lang FROM mix ORDER BY doc_id""".stripMargin) { (s, dir) =>
      curatedDocs(s, dir)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    },

    // The certified pipeline with the NORMALIZED exact-dedup tier
    // (dedup_exact_norm's lowercase + whitespace-collapse key) swapped
    // in for plain exact dedup — one boolean through the shared stage
    // builder, so reformat-only clones (re-wrapped lines, case-changed
    // headlines) are collapsed before decontamination and the mix. This
    // row certifies the normalized tier COMPOSES exactly: same oracle
    // CTE chain with only the survivor GROUP BY key rewritten.
    QueryDef.of("curation_pipeline_norm",
      curationCte(true) + """
        |SELECT doc_id, source, lang FROM mix ORDER BY doc_id""".stripMargin) { (s, dir) =>
      curationStages(s, dir, normDedup = true).mixed
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    },

    // The certified pipeline with the GOPHER RULE GATE in place of the
    // scalar quality threshold — rule-based filtering composed with
    // dedup, decontamination and the weighted mix through the one shared
    // stage builder (the curation_pipeline_norm discipline), so the
    // integration can never drift from the individually-certified
    // gopher_rules row.
    QueryDef.of("curation_pipeline_gopher",
      curationCteGopher + """
        |SELECT doc_id, source, lang FROM mix ORDER BY doc_id""".stripMargin) { (s, dir) =>
      curationStages(s, dir, gopherPre = true).mixed
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    },

    // THE CURATION FUNNEL — the dashboard view of curation_pipeline:
    // surviving document count after EVERY stage (total → quality ≥ 0.5
    // → exact-dedup survivors → decontamination → weighted mix), the
    // first report any pipeline owner reads ("where did my corpus go?").
    // Reuses the exact stage frames of the certified pipeline (one
    // shared builder, so the funnel can never drift from what
    // curation_pipeline actually computes) and the same oracle CTE
    // chain; five 1-row counts unioned, ordered by stage position.
    QueryDef.of("curation_funnel",
      curationCte(false) + """
        |SELECT ord, stage, n FROM (
        |  SELECT CAST(0 AS BIGINT) AS ord, 'total' AS stage,
        |    CAST(count(*) AS BIGINT) AS n FROM documents
        |  UNION ALL SELECT 1, 'quality', CAST(count(*) AS BIGINT) FROM q
        |  UNION ALL SELECT 2, 'dedup', CAST(count(*) AS BIGINT) FROM dd
        |  UNION ALL SELECT 3, 'decontaminate', CAST(count(*) AS BIGINT) FROM clean
        |  UNION ALL SELECT 4, 'mix', CAST(count(*) AS BIGINT) FROM mix
        |) ORDER BY ord""".stripMargin) { (s, dir) =>
      val st = curationStages(s, dir)
      def stageCount(ord: Int, stage: String,
          df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"))
          .select(lit(ord.toLong).as("ord"), lit(stage).as("stage"), col("n"))
      stageCount(0, "total", st.docs)
        .unionAll(stageCount(1, "quality", st.quality))
        .unionAll(stageCount(2, "dedup", st.deduped))
        .unionAll(stageCount(3, "decontaminate", st.clean))
        .unionAll(stageCount(4, "mix", st.mixed))
        .orderBy("ord")
    },

    // Contrastive training-pair generation (ICT-style): anchor = first
    // half of each doc, positive = its own second half, negatives =
    // other docs' second halves picked by pure modular arithmetic over
    // the dense id domain (partner = (id + 1 + mix(id, j) mod (N-1))
    // mod N — never the anchor itself, no global sort/window/rank, and
    // the mix pre-reduces so DuckDB's overflow-checked BIGINT never
    // trips). One positive + two negatives per doc; the oracle replays
    // halving, mix, and partner join verbatim.
    QueryDef.of("contrastive_pairs",
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents
        |), hh AS (
        |  SELECT doc_id, CAST(ceil(len(ts) / 2.0) AS BIGINT) AS hl,
        |         len(ts) AS l, ts
        |  FROM d WHERE len(ts) >= 4
        |), halves AS (
        |  SELECT doc_id, array_to_string(ts[1:hl], ' ') AS text_a,
        |         array_to_string(ts[hl+1:l], ' ') AS text_b
        |  FROM hh
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM halves),
        |pos AS (
        |  SELECT doc_id AS doc_a, doc_id AS doc_b, CAST(1 AS BIGINT) AS label,
        |         CAST(0 AS BIGINT) AS nix, text_a, text_b
        |  FROM halves
        |), neg AS (
        |  SELECT a.doc_id AS doc_a, CAST(c.nix AS BIGINT) AS nix,
        |    (a.doc_id + 1 + (((a.doc_id * 1000003 + c.nix * 10007) % 1048573)
        |       * 2654435761) % (n - 1)) % n AS doc_b,
        |    a.text_a
        |  FROM halves a CROSS JOIN nn
        |       CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS nix) c
        |), negj AS (
        |  SELECT g.doc_a, g.doc_b, CAST(0 AS BIGINT) AS label, g.nix,
        |         g.text_a, b.text_b
        |  FROM neg g JOIN halves b ON g.doc_b = b.doc_id
        |)
        |SELECT doc_a, doc_b, label, nix, text_a, text_b FROM pos
        |UNION ALL
        |SELECT doc_a, doc_b, label, nix, text_a, text_b FROM negj
        |ORDER BY doc_a, nix""".stripMargin) { (s, dir) =>
      graft.operators.Contrastive.ictPairs(
        Tables.documents(s, dir).select("doc_id", "text"), negatives = 2)
    },

    // The curated corpus handed STRAIGHT to the trainer: curation pipeline
    // composed with sequence packing as one plan — the full
    // documents-to-training-sequences path, oracle-checked end-to-end.
    // The pack offsets depend on exactly WHICH docs survive curation, so a
    // hash match here certifies the five-stage composition, not just each
    // stage alone.
    QueryDef.of("training_export",
      curationCte(false) + """
        |, pt AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'))
        |         END AS BIGINT) AS n
        |  FROM mix
        |), po AS (
        |  SELECT doc_id, n,
        |    CAST(COALESCE(SUM(n + 1) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
        |  FROM pt
        |), pc AS (
        |  SELECT doc_id, n, st,
        |    unnest(generate_series(st // 256, (st + n - 1) // 256)) AS chunk_id
        |  FROM po WHERE n > 0
        |)
        |SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
        |  CAST(GREATEST(0, chunk_id * 256 - st) AS BIGINT) AS tok_begin,
        |  CAST(LEAST(n, (chunk_id + 1) * 256 - st) AS BIGINT) AS tok_end
        |FROM pc ORDER BY chunk_id, doc_id""".stripMargin) { (s, dir) =>
      // maxDocTokens: fail-loudly guard against pathological monster rows
      // reaching the chunk-id explode (SequencePack scaladoc) — set far
      // above any real curated document, so it never fires on data the
      // upstream quality filters accepted and the oracle row is unaffected.
      SequencePack
        .packChunks(curatedDocs(s, dir), "doc_id",
          TextFunctions.tokenCount(col("text")), seqLen = 256L, sepTokens = 1L,
          maxDocTokens = 1L << 20)
        .orderBy("chunk_id", "doc_id")
    },


    // Rolling-hash document fingerprint (deterministic integer contract;
    // oracle replicates the same polynomial fold in DuckDB lambdas).
    QueryDef.of("doc_fingerprint",
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |  ELSE list_reduce(
        |    list_prepend(CAST(0 AS BIGINT), list_transform(
        |      string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
        |      t -> list_reduce(
        |             list_prepend(CAST(17 AS BIGINT), list_transform(
        |               generate_series(1, length(t)),
        |               i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
        |             (h, c) -> (h * 31 + c) % 2147483647))),
        |    (h, th) -> (h * 1000003 + th) % 2147483647)
        |  END AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // ----- multimodal ----------------------------------------------------

    // The decode path end-to-end: binary payloads through the typed
    // mapPartitions decoder (per-partition init, batch iteration — the real
    // contract a codec/model decoder needs). The deterministic stand-in
    // checksum is a byte fold replicated exactly in the oracle (ASCII text
    // → utf8 bytes are the character codes).
    QueryDef.of("multimodal_decode",
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT), list_transform(
        |      generate_series(1, length(text)),
        |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) & 2147483647) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id").as("media_id"), lit("text").as("kind"),
          col("text").cast("binary").as("payload"),
          lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeFake(media).toDF()
        .select("media_id", "n_bytes", "checksum")
        .orderBy("media_id")
    },

    // Real binary-file INGEST: spark.read.format("binaryFile") over the sf
    // directory's own files (the natural media-corpus source — one row per
    // file with the payload as a binary column, scanned distributed, never
    // driver-side). Output sticks to byte-content facts that are invariant
    // across scale factors (parquet magic "PAR1" at head AND foot) so one
    // static oracle covers every sf dir; file SIZES differ per sf and are
    // deliberately excluded.
    QueryDef.of("multimodal_scan",
      "SELECT file_name, '50415231' AS magic_hex, 'PAR1' AS footer FROM (VALUES " +
        graft.sources.Tables.names.sorted
          .map(n => s"('$n.parquet')").mkString(", ") +
        ") t(file_name) ORDER BY file_name") { (s, dir) =>
      // pathGlobFilter (not a glob IN the path): a glob path makes the
      // FileStreamSink metadata probe log a noisy FileNotFoundException
      // stack trace for the literal "*.parquet" file on every run
      s.read.format("binaryFile").option("pathGlobFilter", "*.parquet").load(dir)
        .select(
          regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
          hex(substring(col("content"), 1, 4)).as("magic_hex"),
          substring(col("content"), -4, 4).cast("string").as("footer"))
        .orderBy("file_name")
    },

    // PERCEPTUAL-HASH-STYLE CONTENT DEDUP over the multimodal payload
    // bytes — the composition of the dedup and multimodal families: the
    // blockhash/average-hash signature (64 integer-boundary byte-span
    // sums, bit = span above the payload mean) as four 16-bit band
    // values from the native BlockhashBands loop, banded candidates
    // (bands > maxHamming ⇒ pigeonhole recall is structural), hamming
    // verified via per-band bit_count(xor) BEFORE the pair-dedup
    // shuffle. The oracle recomputes the ENTIRE signature pipeline
    // op-for-op in DuckDB (ASCII text ⇒ payload byte = character code,
    // the multimodal_decode contract), so exactness needs NO
    // corpus-separation assumption — the dedup_simhash_scale pattern.
    // A real deployment decodes pixels per partition via MediaCodec and
    // feeds the luma plane through the same signature.
    QueryDef.of("dedup_phash", phashOracle) { (s, dir) =>
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Dedup.phashPairs(media, idCol = "doc_id")
        .orderBy("doc_a", "doc_b")
    },

    // The phash family COMPOSED with cluster resolution — the full
    // content-dedup pipeline a multimodal corpus runs: blockhash pairs →
    // connected components (the union-find loop the text survivors rows
    // certify) → keep the min-id member per cluster. Null payloads have
    // no content to match and pass through as survivors-by-absence on
    // both sides (the text IS NOT NULL filter).
    QueryDef.of("dedup_phash_survivors", phashSurvivorsOracle) { (s, dir) =>
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .filter(col("payload").isNotNull)
      val pairs = Dedup.phashPairs(media, idCol = "doc_id")
        .select("doc_a", "doc_b")
      // loopParts pinned — see dedup_survivors' rationale
      val losers = Dedup.duplicateClusters(pairs, loopParts = 1,
        localPairsCap = 500000L)
        .filter(col("doc_id") =!= col("cluster"))
      media.join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    },

    // Opaque-binary payload plumbing: byte length + header hex, computed as
    // Catalyst expressions over BinaryType (never deserialized row-by-row).
    QueryDef.of("multimodal_stats",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  substr(hex(encode(text)), 1, 16) AS header_hex
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.payloadStats(media)
        .select("doc_id", "n_bytes", "header_hex")
        .orderBy("doc_id")
    },

    // Misra-Gries frequent-items sketch over the corpus token stream —
    // vocabulary heavy-hitters, the bounded-memory profiling pass a 100 TB
    // corpus needs (a plain token groupBy shuffles one row per DISTINCT
    // token; the sketch ships ≤ capacity counters per partition). Certified
    // at its EXACT operating point: capacity 64 ≥ the corpus vocabulary, so
    // no counter is ever evicted and the estimates equal true counts
    // independent of partition order (the `ann_topk_ivf_exact` pattern —
    // machinery certified exactly; the sub-capacity estimate branch and its
    // n/(capacity+1) error bound are certified by SketchSpec).
    QueryDef.of("heavy_hitters",
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS item
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |)
        |SELECT item, CAST(count(*) AS BIGINT) AS est
        |FROM toks GROUP BY item
        |ORDER BY est DESC, item
        |LIMIT 25""".stripMargin) { (s, dir) =>
      import graft.operators.Sketch
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(explode(TextFunctions.tokens(col("text"))).as("item"))
        .agg(Sketch.freqItems(64)(col("item")).as("items"))
        .select(explode(col("items")).as("ic"))
        .select(col("ic.item").as("item"), col("ic.est").as("est"))
        .orderBy(col("est").desc, col("item"))
        .limit(25)
    },

    // Inverted-index build — the retrieval-side twin of the reference's
    // Search pipeline: term → document frequency, total term frequency,
    // and the posting-list HEAD. The head reuses the bounded distinct-
    // neighbor TopK aggregator (score = −doc_id keeps the 8 SMALLEST doc
    // ids, ≤ 8 entries per partition per term crossing the shuffle) — at
    // corpus scale full posting lists are written as bucketed parquet,
    // never materialized per-row; the bounded head is the presentation
    // slice. df uses Spark's two-phase distinct aggregation.
    QueryDef.of("inverted_index",
      """WITH td AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS term
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |)
        |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |  CAST(count(*) AS BIGINT) AS tf_total,
        |  array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 8), ',')
        |    AS postings_head
        |FROM td GROUP BY term
        |ORDER BY df DESC, term
        |LIMIT 20""".stripMargin) { (s, dir) =>
      import graft.operators.TopK
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(
          countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("tf_total"),
          TopK.topK(8)(col("doc_id"), -col("doc_id").cast("double")).as("p"))
        .select(col("term"), col("df"), col("tf_total"),
          array_join(transform(col("p"),
            x => x.getField("neighbor_id").cast("string")), ",").as("postings_head"))
        .orderBy(col("df").desc, col("term"))
        .limit(20)
    },

    // Term search over the inverted-index shape: rank documents by total
    // query-term frequency (integer scoring — oracle-exact; BM25 swaps in
    // a weighted sum without changing the plan shape). Top-10 via
    // orderBy+limit → TakeOrderedAndProject: per-partition heaps, never a
    // global sort or a per-key window.
    QueryDef.of("term_search",
      """WITH td AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS term
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS score
        |FROM td WHERE term IN ('hash', 'join', 'scan')
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term").isin("hash", "join", "scan"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },

    // PHRASE search — exact adjacency ("table hash" as consecutive
    // tokens), the positional-postings completion of the retrieval tier:
    // term_search/bm25 score bags of words; phrases need positions. One
    // tokenize-with-positions pass (tracked persist), each phrase term
    // filters its own posting list BEFORE the positional self-equi-join
    // on (doc_id, pos+1) — the top_ngrams adjacency shape, never a HOF
    // over token arrays — then count per doc, top-10 via
    // TakeOrderedAndProject (ties broken by doc_id).
    QueryDef.of("term_search_phrase",
      """WITH toks AS (
        |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ts)),
        |      i -> struct_pack(pos := i, w := ts[i]))) AS u
        |    FROM (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |          FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0))
        |)
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS score
        |FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.w = 'table' AND b.w = 'hash'
        |GROUP BY a.doc_id
        |ORDER BY score DESC, a.doc_id LIMIT 10""".stripMargin) { (s, dir) =>
      import graft.operators.Caches
      val toks = Caches.persistTracked(Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "w"))))
      toks.filter(col("w") === "table").as("a")
        .join(toks.filter(col("w") === "hash").as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.pos") === col("a.pos") + 1)
        .select(col("a.doc_id").as("doc_id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },

    // BM25 term scoring over the SAME plan shape as term_search — the
    // README claim ("BM25 swaps in without changing the plan shape") as an
    // oracle row. Double determinism is engineered, not hoped for: every
    // AGGREGATE is integer (conditional tf counts per query term, df via
    // count-distinct, corpus token totals as long sums — all order-
    // independent), and ALL floating-point arithmetic happens per-row in
    // one fixed-order expression (c_hash + c_join + c_scan), mirrored
    // token-for-token in DuckDB: idf = ln((N−df+0.5)/(df+0.5)+1), Okapi
    // k1=1.2 / b=0.75 spelled as the exact-double literals 2.2, 1.2, 0.25,
    // 0.75. A per-doc SUM of double contributions would be partition-order
    // nondeterministic — that is exactly what the fixed three-term sum
    // avoids. round(_, 4) only in the output projection, AFTER the top-10
    // selection on raw doubles (ln-derived scores never sit on a
    // half-boundary). The corpus constants ride a broadcast of one 1-row
    // frame (the hybrid_search pattern); ranking stays
    // orderBy+limit → TakeOrderedAndProject (PlanSpec-pinned).
    QueryDef.of("term_search_bm25",
      bm25ScoredCte +
        """
          |SELECT doc_id, round(score, 4) AS bm25 FROM scored
          |ORDER BY score DESC, doc_id
          |LIMIT 10""".stripMargin) { (s, dir) =>
      bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"), round(col("score"), 4).as("bm25"))
    },

    // FUZZY TERM SEARCH — typo-tolerant retrieval (the third face of
    // the term_search family next to exact and phrase): docs containing
    // any token within edit distance ≤ 2 of the (misspelled) query
    // 'sot', which matches sort (d=1), row and slow (d=2). The
    // Levenshtein pass runs on the DISTINCT VOCABULARY — never the
    // token stream — and the matched-term list broadcasts back as an
    // equi-join (at web scale, block the vocabulary by length/prefix
    // first — the fuzzy_join machinery; the distance itself is exact
    // integer DP in both engines). Output per doc: occurrence count,
    // distinct matched terms, best distance — all integer.
    QueryDef.of("term_search_fuzzy",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), near AS (
        |  SELECT t, CAST(levenshtein(t, 'sot') AS BIGINT) AS d
        |  FROM (SELECT DISTINCT t FROM toks)
        |  WHERE levenshtein(t, 'sot') <= 2
        |)
        |SELECT toks.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
        |  CAST(count(DISTINCT toks.t) AS BIGINT) AS n_terms,
        |  CAST(min(near.d) AS BIGINT) AS best_dist
        |FROM toks JOIN near ON toks.t = near.t
        |GROUP BY toks.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
      val near = toks.select("t").distinct()
        .withColumn("d", levenshtein(col("t"), lit("sot")).cast("long"))
        .filter(col("d") <= 2)
      toks.join(broadcast(near), "t")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_matches"),
          count_distinct(col("t")).as("n_terms"),
          min(col("d")).as("best_dist"))
        .orderBy("doc_id")
    },

    // RECIPROCAL-RANK FUSION (Cormack et al. 2009) of the two certified
    // rankers — the OTHER standard hybrid-retrieval combiner next to
    // hybrid_search's linear fusion: rrf = Σ_lists 1/(60 + rank) over
    // the lexical BM25 top-20 and the exact-cosine top-20 (query vector
    // 0; doc_id ≡ vec_id, the hybrid_search identification). RRF needs
    // only per-LIST ranks, so the global-row_number scale objection in
    // hybrid_search's comment does not apply: both rank lists come from
    // BOUNDED partial-agg TopK selections (20 rows each), and the rank
    // assignment is a posexplode over the 20-element array — never a
    // data-sized window. Ranks are integers, the two 1/(60+r) terms are
    // mirrored fixed-order divisions (CAST-spelled literals — the DuckDB
    // DECIMAL-folding pitfall), a doc in one list only contributes that
    // list's term. Top-10 by (rrf DESC, doc_id).
    QueryDef.of("hybrid_rrf",
      bm25ScoredCte +
        """,
          |lex AS (
          |  SELECT doc_id, CAST(row_number() OVER (
          |    ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
          |  FROM scored ORDER BY score DESC, doc_id LIMIT 20
          |),
          |vec AS (
          |  SELECT doc_id, vec_rank FROM (
          |    SELECT c.vec_id AS doc_id, CAST(row_number() OVER (
          |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
          |                                      CAST(c.embedding AS DOUBLE[])) DESC,
          |               c.vec_id) AS BIGINT) AS vec_rank
          |    FROM embeddings q JOIN embeddings c
          |      ON q.vec_id = 0 AND c.vec_id <> 0
          |  ) WHERE vec_rank <= 20
          |),
          |f AS (
          |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
          |    l.lex_rank, v.vec_rank,
          |    coalesce(CAST(1.0 AS DOUBLE)
          |        / (CAST(60.0 AS DOUBLE) + CAST(l.lex_rank AS DOUBLE)),
          |      CAST(0.0 AS DOUBLE))
          |    + coalesce(CAST(1.0 AS DOUBLE)
          |        / (CAST(60.0 AS DOUBLE) + CAST(v.vec_rank AS DOUBLE)),
          |      CAST(0.0 AS DOUBLE)) AS rrf
          |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
          |)
          |SELECT doc_id, lex_rank, vec_rank, rrf FROM f
          |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin) { (s, dir) =>
      val lex = bm25Scored(s, dir)
        .agg(graft.operators.TopK.topK(20)(col("doc_id"), col("score")).as("nn"))
        .select(posexplode(col("nn")).as(Seq("pos", "t")))
        .select(col("t.neighbor_id").as("doc_id"),
          (col("pos") + 1).cast("long").as("lex_rank"))
      val emb = Tables.embeddings(s, dir)
      val vec = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 0), emb,
          k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("vec_rank"))
      def term(r: org.apache.spark.sql.Column) =
        coalesce(lit(1.0) / (lit(60.0) + r.cast("double")), lit(0.0))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
          (term(col("lex_rank")) + term(col("vec_rank"))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },

    // TF-IDF weighted cosine similarity join (top-100 pairs) — the
    // weighted sibling of ngram_jaccard: rare shared shingles count more,
    // boilerplate counts less. Terms are the PORTABLE 62-bit shingle
    // hashes (the dedup_simhash_scale fold), which the oracle recomputes
    // in SQL so join keys AND the sorted-fold order match bit-for-bit;
    // tf/df/N are integer aggregates, each weight is one mirrored double
    // expression, and every unbounded double sum (norms, dots) runs as
    // the repo's standard sorted fold. Ranking lands in
    // TakeOrderedAndProject; ties broken by ids in both engines.
    QueryDef.of("tfidf_topk", tfidfOracle) { (s, dir) =>
      graft.operators.Tfidf.cosinePairsTopK(
        Tables.documents(s, dir).select("doc_id", "text"),
        k = 3, topK = 100, maxShingleDf = 1000)
    },

    // Corpus-overlap matrix: pairwise shingle-set Jaccard between SOURCES
    // (the mix-design / cross-source-contamination measurement — which
    // crawls duplicate each other's content). Shingles travel as 64-bit
    // hashes; the distinct (source, hash) postings join on the hash, so a
    // shingle key meets at most |sources| rows — no hot-key blowup. The
    // oracle recounts with raw string shingles (injectivity argument as
    // ngram_jaccard/decontaminate); the Jaccard division is mirrored
    // op-for-op.
    QueryDef.of("corpus_overlap",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ts) <= 3 THEN [array_to_string(ts, ' ')]
        |         ELSE list_transform(generate_series(1, len(ts) - 2),
        |                             i -> array_to_string(ts[i:i+2], ' ')) END) AS s
        |  FROM toks
        |), ex AS (
        |  SELECT d.source AS source, unnest(s.s) AS g
        |  FROM sh s JOIN documents d ON s.doc_id = d.doc_id
        |), ds AS (SELECT DISTINCT source, g FROM ex),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY source),
        |c AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM ds a JOIN ds b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT c.source_a, c.source_b, na.n AS n_a, nb.n AS n_b, c.n_common,
        |  CAST(c.n_common AS DOUBLE)
        |    / CAST(na.n + nb.n - c.n_common AS DOUBLE) AS jaccard
        |FROM c JOIN n na ON na.source = c.source_a
        |       JOIN n nb ON nb.source = c.source_b
        |ORDER BY source_a, source_b""".stripMargin) { (s, dir) =>
      val ds = Tables.documents(s, dir)
        .select(col("source"),
          explode(array_distinct(TextFunctions.shingleHashes(col("text"), 3))).as("g"))
        .distinct()
      val n = ds.groupBy("source").agg(count(lit(1)).as("n"))
      val pairs = ds.as("a")
        .join(ds.as("b"), col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_common"))
      pairs
        .join(n.as("na"), col("source_a") === col("na.source"))
        .join(n.as("nb"), col("source_b") === col("nb.source"))
        .select(col("source_a"), col("source_b"),
          col("na.n").as("n_a"), col("nb.n").as("n_b"), col("n_common"),
          (col("n_common").cast("double") /
            (col("na.n") + col("nb.n") - col("n_common")).cast("double")).as("jaccard"))
        .orderBy("source_a", "source_b")
    },

    // RAG-ingestion chunking: per-document sliding token windows (64-token
    // chunks, stride 48 → 16-token overlap), emitting the REAL chunk text.
    // Entirely per-row (explode of a bounded sequence + array slice —
    // built-in codegen'd functions, no lambda, no shuffle beyond the final
    // presentation sort), so it scales embarrassingly. Chunk-start rule:
    // k*stride for k = 0..K with K = ceil((n-C)/S) when n > C else 0 —
    // the last chunk may be short, every token is covered, interior chunk
    // boundaries overlap by C-S tokens. The oracle mirrors the arithmetic
    // and the 1-based inclusive list slice exactly.
    QueryDef.of("chunk_overlap",
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents WHERE length(trim(text)) > 0
        |), n AS (
        |  SELECT doc_id, ts, len(ts) AS n FROM t
        |), k AS (
        |  SELECT doc_id, ts, n,
        |    unnest(generate_series(0,
        |      CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) // 48 END)) AS chunk_no
        |  FROM n
        |)
        |SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
        |  CAST(LEAST(64, n - chunk_no * 48) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(ts[chunk_no * 48 + 1 : chunk_no * 48 + LEAST(64, n - chunk_no * 48)], ' ') AS chunk_text
        |FROM k ORDER BY doc_id, chunk_no""".stripMargin) { (s, dir) =>
      val C = 64; val S = 48
      Tables.documents(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
        .withColumn("n", size(col("ts")))
        .select(col("doc_id"), col("ts"), col("n"),
          explode(sequence(lit(0),
            when(col("n") <= C, 0)
              .otherwise(expr(s"CAST((n - $C + ${S - 1}) DIV $S AS INT)")))).as("chunk_no"))
        .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
          least(lit(C), col("n") - col("chunk_no") * S).cast("long").as("n_chunk_tokens"),
          concat_ws(" ",
            slice(col("ts"), col("chunk_no") * S + 1,
              least(lit(C), col("n") - col("chunk_no") * S))).as("chunk_text"))
        .orderBy("doc_id", "chunk_no")
    },

    // Concat-and-chunk sequence packing (GPT-style pretraining-data
    // forming): every doc's whitespace tokens plus one separator laid
    // end-to-end in doc_id order, cut into 256-token training sequences;
    // one output row per (chunk, doc-slice). Pure integer arithmetic, so
    // the oracle replays the whole thing — including the global prefix
    // sum the Spark side computes distributed (range partitions +
    // per-partition window + broadcast base offsets; see SequencePack's
    // scaladoc) — as one DuckDB window, bit-for-bit.
    QueryDef.of("sequence_pack",
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'))
        |         END AS BIGINT) AS n
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n,
        |    CAST(COALESCE(SUM(n + 1) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
        |  FROM t
        |), c AS (
        |  SELECT doc_id, n, st,
        |    unnest(generate_series(st // 256, (st + n - 1) // 256)) AS chunk_id
        |  FROM o WHERE n > 0
        |)
        |SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
        |  CAST(GREATEST(0, chunk_id * 256 - st) AS BIGINT) AS tok_begin,
        |  CAST(LEAST(n, (chunk_id + 1) * 256 - st) AS BIGINT) AS tok_end
        |FROM c ORDER BY chunk_id, doc_id""".stripMargin) { (s, dir) =>
      SequencePack
        .packChunks(Tables.documents(s, dir), "doc_id",
          TextFunctions.tokenCount(col("text")), seqLen = 256L, sepTokens = 1L)
        .orderBy("chunk_id", "doc_id")
    },

    // Deterministic train/val/test split (90/5/5) — the held-out-set
    // assignment decided by fingerprint(text) % 100 against cumulative
    // integer bounds (corpus_mix's cut applied to partitioning instead of
    // sampling). Content-derived, so exact duplicates always land in the
    // SAME split — the train/test-leakage guarantee — and the EXACT
    // per-document membership is oracle-checked via the portable
    // fingerprint fold, not just the split sizes.
    QueryDef.of("stratified_split",
      """WITH fp AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE list_reduce(
        |      list_prepend(CAST(0 AS BIGINT), list_transform(
        |        string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
        |        t -> list_reduce(
        |               list_prepend(CAST(17 AS BIGINT), list_transform(
        |                 generate_series(1, length(t)),
        |                 i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
        |               (h, c) -> (h * 31 + c) % 2147483647))),
        |      (h, th) -> (h * 1000003 + th) % 2147483647)
        |    END AS fp
        |  FROM documents
        |)
        |SELECT doc_id, source,
        |  CASE WHEN fp % 100 < 90 THEN 'train'
        |       WHEN fp % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM fp ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.CorpusMix
      CorpusMix.assignSplits(Tables.documents(s, dir),
          Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    },

    // CDC upsert MERGE: fold a change batch (updates on doc_id%10=3,
    // deletes on %10=7, inserts at doc_id+1M derived from %10=5) into the
    // documents base — the incremental-corpus-refresh primitive (new crawl
    // snapshot in, retracted docs out) as ONE full-outer-join plan, no
    // driver materialization. The change batch is derived deterministically
    // from the corpus itself so the oracle replays derivation + merge
    // exactly; Merge.applyChanges' last-writer-wins seq resolution is
    // exercised in MergeSpec (the derived batch here has one change per
    // key by construction).
    QueryDef.of("upsert_merge",
      """WITH upd AS (
        |  SELECT doc_id, source, n_chars + 1000 AS n_chars FROM documents
        |  WHERE doc_id % 10 = 3
        |), del AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 10 = 7
        |), ins AS (
        |  SELECT doc_id + 1000000 AS doc_id, source, n_chars FROM documents
        |  WHERE doc_id % 10 = 5
        |)
        |SELECT doc_id, source, n_chars FROM (
        |  SELECT b.doc_id, coalesce(u.source, b.source) AS source,
        |    coalesce(u.n_chars, b.n_chars) AS n_chars
        |  FROM documents b
        |  LEFT JOIN upd u ON b.doc_id = u.doc_id
        |  WHERE b.doc_id NOT IN (SELECT doc_id FROM del)
        |  UNION ALL
        |  SELECT doc_id, source, n_chars FROM ins
        |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.Merge
      val base = Tables.documents(s, dir).select("doc_id", "source", "n_chars")
      val changes = base
        .filter(pmod(col("doc_id"), lit(10L)) === 3)
        .select(col("doc_id"), lit("U").as("op"), col("source"),
          (col("n_chars") + 1000L).as("n_chars"))
        .unionByName(base.filter(pmod(col("doc_id"), lit(10L)) === 7)
          .select(col("doc_id"), lit("D").as("op"),
            lit(null).cast("string").as("source"),
            lit(null).cast("long").as("n_chars")))
        .unionByName(base.filter(pmod(col("doc_id"), lit(10L)) === 5)
          .select((col("doc_id") + 1000000L).as("doc_id"), lit("I").as("op"),
            col("source"), col("n_chars")))
      Merge.applyChanges(base, changes, "doc_id")
        .orderBy("doc_id")
    },

    // C4/RefinedWeb line-level exact dedup: a line occurring in several
    // documents survives only at its FIRST corpus position (min encoded
    // (doc_id, line_no) — a partial-agg groupBy + semi join, never a
    // window; Lines.dedupLines scaladoc has the 100 TB shape). The driver
    // corpus is single-line, so the multi-line input is derived
    // deterministically: doc i's text becomes the 3 lines
    // (text_i, text_{i+1}, text_{i+2}) — every line recurs in 3 docs and
    // the survivor pattern (doc 0 keeps 3 lines, every later doc keeps
    // exactly its last) exercises first-occurrence semantics corpus-wide.
    // The oracle replays derivation + dedup exactly.
    QueryDef.of("line_dedup",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |synth AS (
        |  SELECT a.doc_id, a.text || chr(10) || b.text || chr(10) || c.text AS text
        |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |           JOIN d c ON c.doc_id = a.doc_id + 2
        |), ln AS (
        |  SELECT doc_id, u.no AS line_no, u.ln AS line FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ts)),
        |      i -> struct_pack(no := CAST(i - 1 AS BIGINT),
        |        ln := regexp_replace(ts[i],
        |                '^[ \t\x0B\f\r]+|[ \t\x0B\f\r]+$', '', 'g')))) AS u
        |    FROM (SELECT doc_id, string_split(text, chr(10)) AS ts FROM synth))
        |  WHERE length(u.ln) > 0
        |), fst AS (
        |  SELECT line, min(doc_id * 1048576 + line_no) AS enc FROM ln GROUP BY line
        |)
        |SELECT l.doc_id, l.line_no, l.line
        |FROM ln l JOIN fst f ON l.line = f.line
        |WHERE l.doc_id * 1048576 + l.line_no = f.enc
        |ORDER BY doc_id, line_no""".stripMargin) { (s, dir) =>
      import graft.operators.Lines
      val d = Tables.documents(s, dir)
        .filter(col("text").isNotNull).select("doc_id", "text")
      val synth = d
        .join(d.select((col("doc_id") - 1).as("doc_id"), col("text").as("t1")),
          "doc_id")
        .join(d.select((col("doc_id") - 2).as("doc_id"), col("text").as("t2")),
          "doc_id")
        .select(col("doc_id"),
          concat_ws("\n", col("text"), col("t1"), col("t2")).as("text"))
      Lines.dedupLines(synth).orderBy("doc_id", "line_no")
    },

    // Laplace-smoothed BIGRAM predictability — the model-order step up
    // from lm_surprisal's unigram score (KenLM-style quality bucketing
    // one order higher): per doc, mean 1/P(w2|w1) under the corpus's own
    // add-one bigram model — the rational-arithmetic perplexity sibling
    // (all +,×,/ — ln diverges 1 ulp between Catalyst's StrictMath and
    // DuckDB's libm on this argument space; measured, see
    // TextProfile.bigramPredictability). Integer aggregates (k, c12, c1,
    // V) + the per-doc sorted fold; the oracle replays the fold
    // term-for-term (list_sort + list_reduce — the lm_surprisal pattern).
    QueryDef.of("lm_bigram",
      """WITH toks AS (
        |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ts)),
        |      i -> struct_pack(pos := i, w := ts[i]))) AS u
        |    FROM (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |          FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0))
        |), bi AS (
        |  SELECT a.doc_id, a.w AS w1, a.w || ' ' || b.w AS g
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM toks),
        |c12 AS (SELECT g, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY g),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bi GROUP BY w1),
        |dg AS (SELECT doc_id, g, w1, CAST(count(*) AS BIGINT) AS k
        |       FROM bi GROUP BY doc_id, g, w1),
        |terms AS (
        |  SELECT d.doc_id,
        |    list_sort(list(struct_pack(g := d.g, k := d.k, c12 := c12.c12,
        |                               c1 := c1.c1))) AS ts,
        |    CAST(sum(d.k) AS BIGINT) AS n_bigrams
        |  FROM dg d JOIN c12 ON d.g = c12.g JOIN c1 ON d.w1 = c1.w1
        |  GROUP BY d.doc_id
        |)
        |SELECT doc_id, n_bigrams,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(ts,
        |    s -> CAST(s.k AS DOUBLE) * ((CAST(s.c1 AS DOUBLE) + CAST(v AS DOUBLE))
        |         / (CAST(s.c12 AS DOUBLE) + CAST(1.0 AS DOUBLE))))),
        |    (a, x) -> a + x) / CAST(n_bigrams AS DOUBLE) AS mean_inv_prob
        |FROM terms CROSS JOIN v
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.TextProfile.bigramPredictability(
          Tables.documents(s, dir).select("doc_id", "text"))
        .orderBy("doc_id")
    },

    // T5 span corruption (Raffel et al. §3.1.4) — the denoising-objective
    // example former: every 7th 3-token span masked (≈14%, the paper's
    // operating point), sentinels numbered in order, target = sentinel-
    // delimited masked content. Deterministic BY POSITION instead of
    // sampled (no RNG under the oracle bar; re-runs reproduce the same
    // examples). Pure per-row string/int work, replayed token-for-token
    // in DuckDB (list_transform + list_filter + array_to_string).
    QueryDef.of("span_corruption",
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
        |), p AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(ts)), i -> CASE
        |      WHEN ((i-1)//3) % 7 <> 0 THEN ts[i]
        |      WHEN (i-1) % 3 = 0 THEN '<extra_id_' ||
        |        CAST(((i-1)//3)//7 AS VARCHAR) || '>'
        |      ELSE '' END) AS pin,
        |    list_transform(generate_series(1, len(ts)), i -> CASE
        |      WHEN ((i-1)//3) % 7 = 0 AND (i-1) % 3 = 0 THEN '<extra_id_' ||
        |        CAST(((i-1)//3)//7 AS VARCHAR) || '> ' || ts[i]
        |      WHEN ((i-1)//3) % 7 = 0 THEN ts[i]
        |      ELSE '' END) AS ptg,
        |    CAST(len(ts) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(generate_series(1, len(ts)),
        |      i -> ((i-1)//3) % 7 = 0)) AS BIGINT) AS n_masked
        |  FROM d
        |)
        |SELECT doc_id,
        |  array_to_string(list_filter(pin, x -> length(x) > 0), ' ') AS input,
        |  array_to_string(list_filter(ptg, x -> length(x) > 0), ' ') AS target,
        |  n_tokens, n_masked
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.TextProfile.spanCorruption(
          Tables.documents(s, dir).select("doc_id", "text"))
        .orderBy("doc_id")
    },

    // Collocation mining by LIFT — pointwise-mutual-information ranking in
    // its rational form P(w1w2)/(P(w1)P(w2)) = c12·N²/(Nb·c1·c2) (the PMI
    // exponential — same ranking, no ln: the lm_bigram ulp lesson), min
    // support c12 ≥ 5. Phrase mining / tokenizer-vocabulary candidates:
    // high-lift adjacent pairs are the multi-word units worth fusing.
    // All-integer aggregates; ONE fixed-order double expression per
    // surviving bigram (left-assoc ×/÷ identical in both engines);
    // TakeOrderedAndProject top-20 under the (lift, ngram) total order;
    // corpus constants N/Nb ride 1-row broadcasts (the lm_surprisal
    // allowlist class).
    QueryDef.of("collocations_lift",
      """WITH toks AS (
        |  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ts)),
        |      i -> struct_pack(pos := i, w := ts[i]))) AS u
        |    FROM (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ts
        |          FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0))
        |), uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks),
        |bi AS (
        |  SELECT a.w AS w1, b.w AS w2, a.w || ' ' || b.w AS ngram
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), bc AS (
        |  SELECT w1, w2, ngram, CAST(count(*) AS BIGINT) AS c12
        |  FROM bi GROUP BY w1, w2, ngram
        |), nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bi)
        |SELECT ngram, c12,
        |  (CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) /
        |  (CAST(nb AS DOUBLE) * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |FROM bc JOIN uni u1 ON bc.w1 = u1.w JOIN uni u2 ON bc.w2 = u2.w
        |CROSS JOIN n CROSS JOIN nb
        |WHERE c12 >= 5
        |ORDER BY lift DESC, ngram LIMIT 20""".stripMargin) { (s, dir) =>
      import graft.operators.Caches
      val toks = Caches.persistTracked(Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "w"))))
      val uni = toks.groupBy("w").agg(count(lit(1)).as("c"))
      val nTok = toks.agg(count(lit(1)).as("n"))
      val bi = Caches.persistTracked(toks.as("a")
        .join(toks.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
        .select(col("a.w").as("w1"), col("b.w").as("w2"),
          concat_ws(" ", col("a.w"), col("b.w")).as("ngram")))
      val bc = bi.groupBy("w1", "w2", "ngram").agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= 5)
      val nBi = bi.agg(count(lit(1)).as("nb"))
      bc.join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
        .select(col("ngram"), col("c12"),
          ((col("c12").cast("double") * col("n").cast("double") *
            col("n").cast("double")) /
            (col("nb").cast("double") * col("c1").cast("double") *
              col("c2").cast("double"))).as("lift"))
        .orderBy(col("lift").desc, col("ngram"))
        .limit(20)
    }
  )
}
