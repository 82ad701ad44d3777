package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Columnar text primitives vs plain-Scala reference implementations. */
class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private val M = 2147483647L
  private def refTokens(s: String): Seq[String] = {
    val t = s.trim; if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }
  private def refTokenHash(t: String, mult: Long): Long =
    t.foldLeft(17L)((h, c) => (h * mult + c.toLong) % M)
  private def refShingles(s: String, k: Int): Seq[String] = {
    val ts = refTokens(s)
    if (ts.size <= k) Seq(ts.mkString(" "))
    else ts.sliding(k).map(_.mkString(" ")).toSeq
  }
  private def refFingerprint(s: String): Long =
    refTokens(s).foldLeft(0L)((h, t) => (h * 1000003L + refTokenHash(t, 31L)) % M)
  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "single",
    "  padded   with   spaces  ",
    "punct! heavy, text; with: lots? of. marks",
    "one two three four five six seven eight nine ten eleven twelve")

  test("tokens/tokenCount match the Scala reference (incl. empty/blank)") {
    val all = samples ++ Seq("", "   ")
    val got = all.toDF("t")
      .select(TextFunctions.tokens(col("t")), TextFunctions.tokenCount(col("t")))
      .collect()
    all.zip(got).foreach { case (s, row) =>
      assert(row.getSeq[String](0) == refTokens(s), s"tokens($s)")
      assert(row.getInt(1) == refTokens(s).size, s"tokenCount($s)")
    }
  }

  test("tokenHash and fingerprint match the polynomial reference") {
    val got = samples.toDF("t")
      .select(TextFunctions.tokenHash(col("t")), TextFunctions.fingerprint(col("t")))
      .collect()
    samples.zip(got).foreach { case (s, row) =>
      assert(row.getLong(0) == refTokenHash(s, 31L), s"tokenHash($s)")
      assert(row.getLong(1) == refFingerprint(s), s"fingerprint($s)")
    }
  }

  test("shingles match sliding windows (short docs → one whole-doc shingle)") {
    val got = samples.toDF("t")
      .select(TextFunctions.shingles(col("t"), 3)).collect()
    samples.zip(got).foreach { case (s, row) =>
      assert(row.getSeq[String](0) == refShingles(s, 3), s"shingles($s)")
    }
  }

  test("simhash: deterministic, 62-bit, near-dups close / unrelated docs far") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = a + " nu" // one extra token — high shingle overlap
    val c = "completely unrelated content with different words in every spot"
    val df = Seq(a, b, c, a).toDF("t").select(TextFunctions.simhash(col("t")))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) == sigs(3)) // deterministic
    assert((sigs(0) >>> 62) == 0L) // only bits 0..61 used
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sigs(0), sigs(1)) < ham(sigs(0), sigs(2)),
      s"near ${ham(sigs(0), sigs(1))} !< far ${ham(sigs(0), sigs(2))}")
  }

  test("randomized: tokens/tokenHash/fingerprint/shingles match references") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcXYZ019 .,!@#   " // printable ASCII incl. runs of spaces
    val randoms = (1 to 40).map { _ =>
      val n = rnd.nextInt(120)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val got = randoms.toDF("t").select(
      TextFunctions.tokens(col("t")),
      TextFunctions.tokenHash(col("t")),
      TextFunctions.fingerprint(col("t")),
      TextFunctions.shingles(col("t"), 3),
      TextFunctions.fingerprintHof(col("t"))).collect()
    randoms.zip(got).foreach { case (s, row) =>
      assert(row.getSeq[String](0) == refTokens(s), s"tokens(${s.take(40)}...)")
      assert(row.getLong(1) == refTokenHash(s, 31L), s"tokenHash(${s.take(40)})")
      assert(row.getLong(2) == refFingerprint(s), s"fingerprint(${s.take(40)})")
      assert(row.getSeq[String](3) == refShingles(s, 3), s"shingles(${s.take(40)})")
      assert(row.getLong(4) == refFingerprint(s), s"fingerprintHof(${s.take(40)})")
    }
  }

  test("hammingDistance is bit_count of xor") {
    val got = Seq((3L, 5L), (0L, 0L), (Long.MaxValue, 0L)).toDF("a", "b")
      .select(TextFunctions.hammingDistance(col("a"), col("b"))).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(2, 0, 63))
  }

  test("minhash signature agreement estimates Jaccard for near-identical docs") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a + " extra" // high shingle overlap
    val c = "totally different words entirely here now ok yes no maybe"
    val df = Seq(a, b, c).toDF("t")
      .select(TextFunctions.minhashSignature(col("t"), 3, 32).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    def agree(x: Seq[Long], y: Seq[Long]) =
      x.zip(y).count { case (p, q) => p == q } / 32.0
    assert(agree(sigs(0), sigs(1)) > 0.5)
    assert(agree(sigs(0), sigs(2)) < 0.3)
  }

  test("aggregate-path and native per-row signatures ≡ the column references") {
    // the operators compute signatures via the native per-row expressions
    // (MinhashFromFeatures/SimhashFromHashes over ShingleHashes); these —
    // and the aggregate twins — must equal the column HOF references
    // bit-for-bit or every pair-set correctness argument silently shifts
    val docs = (samples ++ Seq("x", "one two three")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "t")
    val exploded = docs.select(col("doc_id"),
      explode(TextFunctions.shingles(col("t"), 3)).as("s"))
    val aggMin = exploded.groupBy("doc_id")
      .agg(TextFunctions.minhashAgg(xxhash64(col("s")), 32).as("sig"))
    val colMin = docs.select(col("doc_id"),
      TextFunctions.minhashSignature(col("t"), 3, 32).as("sig"))
    val natMin = docs.select(col("doc_id"),
      TextFunctions.minhashSig(
        TextFunctions.shingleHashes(col("t"), 3), 32).as("sig"))
    val minRef = colMin.orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq
    assert(aggMin.orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq == minRef)
    assert(natMin.orderBy("doc_id").collect().map(_.getSeq[Long](1)).toSeq == minRef)
    val aggSim = exploded.groupBy("doc_id")
      .agg(TextFunctions.simhashAgg(xxhash64(col("s"))).as("sh"))
    val colSim = docs.select(col("doc_id"), TextFunctions.simhash(col("t"), 3).as("sh"))
    val natSim = docs.select(col("doc_id"),
      TextFunctions.simhashSig(TextFunctions.shingleHashes(col("t"), 3)).as("sh"))
    val simRef = colSim.orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(aggSim.orderBy("doc_id").collect().map(_.getLong(1)).toSeq == simRef)
    assert(natSim.orderBy("doc_id").collect().map(_.getLong(1)).toSeq == simRef)
    // native edge semantics: null array → null; the wired pipelines never
    // produce an EMPTY hash array (ShingleHashes emits ≥1 element), but the
    // expressions' contracts are pinned anyway: empty minhash = all-M seed,
    // empty simhash = 0
    val edge = spark.sql(
      "SELECT CAST(null AS ARRAY<BIGINT>) AS a, CAST(array() AS ARRAY<BIGINT>) AS e")
      .select(TextFunctions.minhashSig(col("a"), 4).as("mn"),
        TextFunctions.minhashSig(col("e"), 4).as("me"),
        TextFunctions.simhashSig(col("a")).as("sn"),
        TextFunctions.simhashSig(col("e")).as("se"))
      .collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(2))
    assert(edge.getSeq[Long](1) == Seq.fill(4)(2147483647L))
    assert(edge.getLong(3) == 0L)
  }

  test("token metrics (native TokenStats path) match plain-Scala references") {
    val stop = TextFunctions.stopwords.toSet
    def punct(c: Char) = (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
    // Spark-trim semantics: ' ' only (Scala's .trim also strips tabs —
    // wrong reference for tab-edged strings), split keeps empty tokens at
    // non-space whitespace edges (limit -1)
    def sparkTokens(s: String): Seq[String] = {
      val t = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      if (t.isEmpty) Seq.empty else t.split("\\s+", -1).toSeq
    }
    val all = samples ++ Seq("", "   ", "\ta b\t", "a-b c!d e.f the of")
    val got = all.toDF("t").select(
      TextFunctions.tokenCount(col("t")),
      TextFunctions.subwordCountEstimate(col("t")),
      TextFunctions.meanTokenLength(col("t")),
      TextFunctions.punctRatio(col("t")),
      TextFunctions.stopwordRatio(col("t"))).collect()
    all.zip(got).foreach { case (s, row) =>
      val ts = sparkTokens(s)
      assert(row.getInt(0) == ts.size, s"tokenCount($s)")
      val subw = ts.map(t => math.max(1L, math.ceil(t.length / 6.0).toLong)).sum
      assert(row.getLong(1) == subw, s"subwords($s)")
      val mean = if (ts.isEmpty) 0.0 else ts.map(_.length).sum.toDouble / ts.size
      assert(row.getDouble(2) == mean, s"meanTokLen($s)")
      val pr = if (s.isEmpty) 0.0 else s.count(punct).toDouble / s.length
      assert(row.getDouble(3) == pr, s"punctRatio($s)")
      val sr = if (ts.isEmpty) 0.0 else ts.count(stop).toDouble / ts.size
      assert(row.getDouble(4) == sr, s"stopwordRatio($s)")
    }
  }

  test("quality score stays in [0,1] and ranks prose above junk") {
    val prose = "the cat sat on the mat and it was a fine day for all of them"
    val junk = "@@@@ !!!! #### $$$$ %%%%"
    val got = Seq(prose, junk).toDF("t")
      .select(TextFunctions.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("langId picks marker language, und when nothing scores") {
    val cases = Seq(
      "the dog and the cat is here" -> "en",
      "der Hund und die Katze ist hier" -> "de",
      "le chien et la vache est ici" -> "fr",
      "el perro que los gatos una casa es" -> "es",
      "我 是 的" -> "zh",
      "zzz qqq" -> "und")
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.langId(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("native langId ≡ composable twin (ties, empty, null, mixed markers)") {
    // ties exercise the lexicographically-later tie-break ('sch' + ' est ':
    // de vs fr both score), empties/nulls the "und" collapse
    val tricky: Seq[String] = samples ++ Seq(
      "", "   ", null,
      "sch est",                       // de=1 fr=1 tie → fr
      " the und der le el 的 ",        // multi-language marker soup
      "ing  is  est  es ",             // en/fr/es partial ties
      "DER HUND UND DIE KATZE IST")    // upper-case → lower() path
    val df = tricky.toDF("t")
      .select(TextFunctions.langId(col("t")).as("native"),
        TextFunctions.langIdHof(col("t")).as("hof"))
    val rows = df.collect()
    tricky.zip(rows).foreach { case (s, r) =>
      assert(r.getString(0) == r.getString(1), s"langId($s)")
    }
  }

  test("lang_id and doc_fingerprint are registered as SQL functions") {
    val r = spark.sql(
      "SELECT lang_id('the cat and the dog is here') AS l, " +
        "doc_fingerprint('a b c') AS fp").collect()(0)
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == refFingerprint("a b c"))
  }

  test("randomized: native signature invariances (permutation; multiplicity)") {
    // MinHash = per-lane MIN → invariant under permutation AND duplication
    // of the feature array. SimHash = multiplicity-weighted votes →
    // invariant under permutation only (a duplicated hash votes twice).
    val rnd = new scala.util.Random(7)
    val rows = (1 to 30).map { _ =>
      val n = 1 + rnd.nextInt(40)
      val fs = Seq.fill(n)(rnd.nextLong())
      val perm = rnd.shuffle(fs)
      val dup = fs ++ Seq.fill(1 + rnd.nextInt(5))(fs(rnd.nextInt(n)))
      (fs, perm, dup)
    }
    val got = rows.toDF("fs", "perm", "dup").select(
      TextFunctions.minhashSig(col("fs"), 16).as("m0"),
      TextFunctions.minhashSig(col("perm"), 16).as("mp"),
      TextFunctions.minhashSig(col("dup"), 16).as("md"),
      TextFunctions.simhashSig(col("fs")).as("s0"),
      TextFunctions.simhashSig(col("perm")).as("sp")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash permutation")
      assert(r.getSeq[Long](0) == r.getSeq[Long](2), "minhash duplication")
      assert(r.getLong(3) == r.getLong(4), "simhash permutation")
    }
  }

  test("signature expressions are registered as SQL functions") {
    val sql = spark.sql(
      "SELECT simhash_from_hashes(shingle_hashes('a b c d e', 3)) AS sh, " +
        "minhash_from_features(shingle_hashes('a b c d e', 3), 8) AS mh").collect()(0)
    val viaCol = Seq("a b c d e").toDF("t").select(
      TextFunctions.simhashSig(TextFunctions.shingleHashes(col("t"), 3)).as("sh"),
      TextFunctions.minhashSig(TextFunctions.shingleHashes(col("t"), 3), 8).as("mh"))
      .collect()(0)
    assert(sql.getLong(0) == viaCol.getLong(0))
    assert(sql.getSeq[Long](1) == viaCol.getSeq[Long](1))
  }
}
