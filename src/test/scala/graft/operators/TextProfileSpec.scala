package graft.operators

import graft.SparkSpecBase

class TextProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("repetitionStats: hand-computed counts and fractions on planted docs") {
    val docs = Seq(
      (1L, "a a a b"),            // tokens: a×3, b×1; bigrams: "a a"×2, "a b"×1
      (2L, "x y z w"),            // all distinct; bigrams all distinct
      (3L, "spam spam spam spam") // fully repeated
    ).toDF("doc_id", "text")
    val got = TextProfile.repetitionStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 3L, 3.0 / 4.0, 3L, 2.0 / 3.0),
      (2L, 4L, 4L, 1L, 1.0 / 4.0, 3L, 1.0 / 3.0),
      (3L, 4L, 1L, 4L, 1.0, 3L, 1.0)))
  }

  test("corpusDupSpans: hand-computed across-doc span sharing") {
    val docs = Seq(
      (1L, "a b c d"),     // spans: "a b c", "b c d"
      (2L, "a b c x"),     // spans: "a b c" (shared w/ 1), "b c x"
      (3L, "z z z z z"),   // spans all "z z z" -> ONE distinct, unshared
      (4L, "q r"),         // <= k tokens -> whole doc is the single span
      (5L, "q r")          // exact dup of 4 -> both fully duplicated
    ).toDF("doc_id", "text")
    val got = Caches.scoped {
      TextProfile.corpusDupSpans(docs, k = 3).orderBy("doc_id")
        .as[(Long, Long, Long, Double)].collect().toSeq
    }
    assert(got == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0),
      (4L, 1L, 1L, 1.0),
      (5L, 1L, 1L, 1.0)))
  }

  test("bigramPredictability: hand-computed add-one bigram model; sorted fold") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b"×2, "b a"×1
      (2L, "a b c"),   // "a b", "b c"
      (3L, "z")        // no bigrams → absent from output
    ).toDF("doc_id", "text")
    // corpus: c12("a b")=3, c12("b a")=1, c12("b c")=1; c1(a)=3, c1(b)=2; V=4
    val got = Caches.scoped {
      TextProfile.bigramPredictability(docs).orderBy("doc_id")
        .as[(Long, Long, Double)].collect().toSeq
    }
    // folds run over the per-doc list sorted by bigram string; pure
    // rational arithmetic (1/P terms), so the expectation is exact
    val e1 = ((0.0 + 2.0 * ((3.0 + 4.0) / (3.0 + 1.0)))
      + 1.0 * ((2.0 + 4.0) / (1.0 + 1.0))) / 3.0
    val e2 = ((0.0 + 1.0 * ((3.0 + 4.0) / (3.0 + 1.0)))
      + 1.0 * ((2.0 + 4.0) / (1.0 + 1.0))) / 2.0
    assert(got == Seq((1L, 3L, e1), (2L, 2L, e2)))
  }

  test("spanCorruption: hand-computed masking, sentinel numbering, short tail span") {
    // 25 tokens t0..t24: spans 0 (t0-t2) and 7 (t21-t23) mask; t24 is the
    // short tail of span 8 (unmasked)
    val text = (0 until 25).map("t" + _).mkString(" ")
    val got = TextProfile.spanCorruption(Seq((1L, text)).toDF("doc_id", "text"))
      .as[(Long, String, String, Long, Long)].collect().head
    val keptMiddle = (3 until 21).map("t" + _).mkString(" ")
    assert(got == ((1L,
      s"<extra_id_0> $keptMiddle <extra_id_1> t24",
      "<extra_id_0> t0 t1 t2 <extra_id_1> t21 t22 t23",
      25L, 6L)))
    // a doc shorter than one span: fully masked into one sentinel
    val tiny = TextProfile.spanCorruption(Seq((2L, "a b")).toDF("doc_id", "text"))
      .as[(Long, String, String, Long, Long)].collect().head
    assert(tiny == ((2L, "<extra_id_0>", "<extra_id_0> a b", 2L, 2L)))
  }

  test("bpeMerges: hand-computed merge table, greedy overlap, tie-breaks, exhaustion") {
    // Corpus: "low" ×5, "lower" ×2, "aaaa" ×1  (token stream via repeats)
    //   step 1 pairs: lo×7, ow×7, we×2, er×2, aa×3  → argmax tied at 7
    //     between (l,o) and (o,w): tie-break by (lhs, rhs) string order →
    //     (l,o) wins. Merge: low → [lo,w], lower → [lo,w,e,r], aaaa stays.
    //   step 2: (lo,w)×7, (w,e)×2, (e,r)×2, (a,a)×3 → (lo,w). Note greedy
    //     left-to-right on "aaaa": pairs (a,a) at 3 positions count 3.
    //   step 3: (a,a)×3 beats (w,e)×2/(e,r)×2 → merge (a,a): "aaaa" →
    //     [aa, aa] (non-overlapping greedy — NOT [aa,a] here: 4 a's pair
    //     twice).
    //   step 4: (aa,aa)×1, (w,e)×2, (e,r)×2 → (e,r) vs (w,e): count tie at
    //     2 → lexicographic: (e,r) wins. lower → [low,e? no: [lo w] merged
    //     → "low" symbol? step 2 merged (lo,w) → lower = [low,e,r]] → after
    //     (e,r): [low, er].
    //   step 5: (aa,aa)×1, (low,er)×2 → (low,er). step 6: (aa,aa)×1.
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "aaaa")
    ).toDF("doc_id", "text")
    val got = Caches.scoped {
      TextProfile.bpeMerges(docs, k = 6).orderBy("step")
        .as[(Int, String, String, Long)].collect().toSeq
    }
    assert(got == Seq(
      (1, "l", "o", 7L),
      (2, "lo", "w", 7L),
      (3, "a", "a", 3L),
      (4, "e", "r", 2L),
      (5, "low", "er", 2L),
      (6, "aa", "aa", 1L)))
    // exhaustion: k beyond full merging stops early instead of looping
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val g2 = Caches.scoped {
      TextProfile.bpeMerges(tiny, k = 5).as[(Int, String, String, Long)]
        .collect().toSeq
    }
    assert(g2 == Seq((1, "a", "b", 2L)))
  }

  test("repetitionStats: <= k tokens collapse to one shingle (ShingleHashes rule)") {
    // a 2-token doc has ONE bigram shingle (the whole doc), and a 1-token
    // doc has one token — mirroring ShingleHashes' n <= k branch, which is
    // exactly what the DuckDB oracle's CASE arm reproduces
    val docs = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val got = TextProfile.repetitionStats(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 1L, 1.0, 1L, 1.0),
      (2L, 2L, 2L, 1L, 0.5, 1L, 1.0)))
  }

  test("bpeEncode ≡ replaying bpeMerges' table over each word (sf0.001 corpus)") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
    val k = 4
    val merges = TextProfile.bpeMerges(docs, k)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    Caches.releaseAll()
    val got = TextProfile.bpeEncode(docs, k).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    Caches.releaseAll()
    // reference: per word, char-split then apply each merge left-to-right
    // (same non-overlapping replace semantics), count final symbols
    val SEP = "\u001F"
    def encodeWord(w: String): Long = {
      var seg = w.map(_.toString).mkString(SEP)
      merges.foreach { case (_, lhs, rhs, _) =>
        seg = seg.replace(lhs + SEP + rhs, lhs + rhs)
      }
      (seg.split(SEP, -1).length).toLong
    }
    val expected = docs.as[(Long, String)].collect().toSeq
      .filter(d => d._2 != null && d._2.trim.nonEmpty)
      .map { case (id, t) =>
        val ws = t.trim.split("\\s+").toSeq
        (id, ws.size.toLong, ws.map(encodeWord).sum)
      }.sortBy(_._1)
    assert(got == expected)
    // merging can only shrink: n_tokens <= n_bpe <= total chars
    got.foreach(r => assert(r._2 <= r._3))
  }

  test("gopherRules: each rule fires on its own planted violator") {
    val docs = Seq(
      // passes all five rules
      (1L, "the quick brown foxes jumped over the fence and ran away today"),
      // 5 words (< 10) and zero stopwords
      (2L, "alpha beta gamma delta epsilon"),
      // digits only: mean word length 2 (< 3), zero alpha words
      (3L, "11 22 33 44 55 66 77 88 99 00 11 22"),
      // two ellipsis runs over 12 words -> symbol ratio > 0.1; alpha 10/12
      (4L, "the little brown dog ... jumped over that green fence ... today"),
      // empty text: 0 words -> word count + stopwords fail, ratios vacuous
      (5L, "")
    ).toDF("doc_id", "text")
    val got = TextProfile.gopherRules(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 12L, 1L, 1L, 1L, 1L, 1L, 1L),
      (2L, 5L, 0L, 1L, 1L, 1L, 0L, 0L),
      (3L, 12L, 1L, 0L, 0L, 1L, 0L, 0L),
      (4L, 12L, 1L, 1L, 1L, 0L, 1L, 0L),
      (5L, 0L, 0L, 1L, 1L, 1L, 0L, 0L)))
  }

  test("sourceDivergence: hand case bit-equal to a token-ordered replay") {
    val docs = Seq(
      (1L, "srcA", "x x x y"),
      (2L, "srcA", "x y y z"),
      (3L, "srcB", "z z z z w")
    ).toDF("doc_id", "source", "text")
    val got = Caches.scoped {
      TextProfile.sourceDivergence(docs).orderBy("source")
        .as[(String, Long, Long, Double)].collect().toSeq
    }
    // corpus: x4 y3 z5 w1, n=13; srcA: x4 y3 z1 (ns=8); srcB: z4 w1 (ns=5)
    def term(cst: Long, ns: Long, ct: Long, n: Long): Double = {
      val p = cst.toDouble / ns.toDouble
      p * math.log(p / (ct.toDouble / n.toDouble))
    }
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq(("srcA", 8L, 3L), ("srcB", 5L, 2L)))
    // folds run in token order: srcA over x < y < z, srcB over w < z
    val wantA = ((0.0 + term(4, 8, 4, 13)) + term(3, 8, 3, 13)) + term(1, 8, 5, 13)
    val wantB = (0.0 + term(1, 5, 1, 13)) + term(4, 5, 5, 13)
    assert(java.lang.Double.doubleToLongBits(got(0)._4) ==
      java.lang.Double.doubleToLongBits(wantA))
    assert(java.lang.Double.doubleToLongBits(got(1)._4) ==
      java.lang.Double.doubleToLongBits(wantB))
    assert(got.forall(_._4 >= 0.0))
  }

  test("sourceDivergence: identically-distributed sources have KL = 0") {
    val docs = Seq(
      (1L, "a", "p q r"), (2L, "b", "p q r")
    ).toDF("doc_id", "source", "text")
    val got = Caches.scoped {
      TextProfile.sourceDivergence(docs)
        .as[(String, Long, Long, Double)].collect().toSeq
    }
    // p_s(t) = 1/3 = p(t) for every token → each term ln(1) = 0 exactly
    assert(got.forall(_._4 == 0.0))
  }

  test("gopherRules: sf0.001 corpus pass counts pinned") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val agg = TextProfile.gopherRules(docs)
      .agg(org.apache.spark.sql.functions.sum("pass_word_count"),
        org.apache.spark.sql.functions.sum("pass_mean_word_len"),
        org.apache.spark.sql.functions.sum("pass_alpha_words"),
        org.apache.spark.sql.functions.sum("pass_symbol_ratio"),
        org.apache.spark.sql.functions.sum("pass_stopwords"),
        org.apache.spark.sql.functions.sum("pass"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // independently computed in DuckDB on the committed testdata
    assert(agg == ((453L, 500L, 500L, 500L, 391L, 344L, 500L)))
  }
}
