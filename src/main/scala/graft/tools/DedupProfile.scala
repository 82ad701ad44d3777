package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Dev-only stage profiler for the dedup pipelines (not part of the driver
  * contract): times each stage of the composed near-dup pipeline at the
  * given sf dir so regressions can be localized. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warmup count")(docs.count())

    // SPARK_GRAFT_PROFILE_REPS=n: rep-mode — run the dedup_survivors
    // pipeline n times with the bench's drain between reps, timing the two
    // halves (exact pair detection vs cluster loop + anti-join) separately,
    // to localize rep-to-rep variance to a stage. Prints and exits.
    sys.env.get("SPARK_GRAFT_PROFILE_REPS").map(_.toInt).foreach { n =>
      // the bench's OWN drain, not a copy: the profiler exists to localize
      // bench rep variance, so its inter-rep state transitions must stay
      // byte-identical to the bench's (a hand-copied drain silently
      // diverged once the bench's drain semantics changed)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        // pairs PERSISTED before the pairs/loop split point: without it the
        // loop half's first action (duplicateClusters' input persist) would
        // re-execute the whole prefix-join pair detection INSIDE the loop
        // timing (only ngramJaccard's tracked shingle intermediates are
        // warm), over-charging exactly the stage this tool exists to
        // localize. The noop write materializes the cache inside the pairs
        // timing, where the detection cost belongs.
        val pairs = Dedup.ngramJaccard(docs, 3, 0.5, 1000,
          hashShingles = true, prefixFilter = true).select("doc_a", "doc_b")
          .persist()
        try {
          pairs.write.format("noop").mode("overwrite").save()
          val t1 = System.nanoTime()
          // loopParts = 1: mirror the wired dedup_survivors plan exactly
          val losers = Dedup.duplicateClusters(pairs, loopParts = 1)
            .filter(col("doc_id") =!= col("cluster"))
          val t2 = System.nanoTime()
          docs.join(losers, Seq("doc_id"), "left_anti").select("doc_id")
            .write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          println(f"[profile] rep $i pairs ${(t1 - t0) / 1e9}%.2f s " +
            f"loop ${(t2 - t1) / 1e9}%.2f s survivors ${(t3 - t2) / 1e9}%.2f s " +
            f"total ${(t3 - t0) / 1e9}%.2f s")
        } finally pairs.unpersist(blocking = true)
        graft.Bench.drain(spark)
      }
      spark.stop()
      return
    }

    val shingled = docs.select(col("doc_id"), shingles(col("text"), 3).as("shs"))
    time("shingles (HOF, reference)")(shingled.write.format("noop").mode("overwrite").save())

    val native = docs.select(col("doc_id"), shingleHashes(col("text"), 3).as("sh0"))
    time("shingle_hashes (native)")(native.write.format("noop").mode("overwrite").save())

    val hashed = docs.select(col("doc_id"),
      array_distinct(shingleHashes(col("text"), 3)).as("sh0"))
    time("native distinct sets")(hashed.write.format("noop").mode("overwrite").save())

    val exploded = docs.select(col("doc_id"), explode(shingleHashes(col("text"), 3)).as("f"))
    val sig = exploded.groupBy("doc_id").agg(minhashAgg(col("f"), 32).as("sig"))
    time("minhash sig (agg path)")(sig.write.format("noop").mode("overwrite").save())

    def release(): Unit = { graft.operators.Caches.releaseAll(); spark.catalog.clearCache() }

    val cand = Dedup.minhashLsh(docs, 3, 32, 8, 0.5)
    time("minhashLsh pairs")(cand.write.format("noop").mode("overwrite").save())
    release()

    val full = Dedup.minhashNgramJaccard(docs, 3, 0.5, 32, 8, 1000)
    time("composed pipeline")(full.write.format("noop").mode("overwrite").save())
    release()

    val prefix = Dedup.ngramJaccard(docs, 3, 0.5, 1000, hashShingles = true,
      prefixFilter = true)
    time("prefix-filter exact")(prefix.write.format("noop").mode("overwrite").save())
    release()

    val naive = Dedup.ngramJaccard(docs, 3, 0.5, 1000, hashShingles = true)
    time("naive inverted-index exact")(naive.write.format("noop").mode("overwrite").save())
    release()

    val pairs = Dedup.minhashNgramJaccard(docs, 3, 0.5, 32, 8, 1000)
      .select("doc_a", "doc_b")
    // duplicateClusters runs its loop EAGERLY, so the call itself is the
    // work — NOTE this timing includes re-executing the upstream pair
    // pipeline (its first action materializes it)
    val clusters = time("pairs -> clusters (loop)")(Dedup.duplicateClusters(pairs))

    // pure loop overhead: in-memory pairs, no upstream pipeline
    import spark.implicits._
    val memPairs = (0L until 250L).map(i => (i * 2, i * 2 + 1))
      .toDF("doc_a", "doc_b")
    time("clusters loop (in-memory pairs)")(Dedup.duplicateClusters(memPairs))
    val survivors = docs.join(
        clusters.filter(col("doc_id") =!= col("cluster")), Seq("doc_id"), "left_anti")
      .select("doc_id")
    time("clusters -> survivors")(survivors.write.format("noop").mode("overwrite").save())
    release()

    println(s"[profile] candidate pairs: ${Dedup.minhashLsh(docs, 3, 32, 8, 0.5).count()}")
    release()

    // simhash hamming histogram over NON-identical-text pairs — context for
    // reading detector output. (dedup_simhash_scale's oracle recomputes the
    // portable signatures op-for-op in DuckDB, so it needs NO separation:
    // near pairs at hamming <= 3 are detected identically by both engines.
    // Only the wide-radius dedup_simhash row leans on corpus separation.)
    val ssig = docs
      .select(col("doc_id"), col("text"),
        explode(shingleHashes(col("text"), 3)).as("h"))
      .groupBy("doc_id", "text").agg(simhashAgg(col("h")).as("sh"))
      .persist()
    val l = ssig.select(col("doc_id").as("a"), col("text").as("ta"), col("sh").as("sa"))
    val r = ssig.select(col("doc_id").as("b"), col("text").as("tb"), col("sh").as("sb"))
    val ham = l.crossJoin(r).filter(col("a") < col("b"))
      .filter(col("ta") =!= col("tb"))
      .select(hammingDistance(col("sa"), col("sb")).as("d"))
    val hist = ham.groupBy("d").count().orderBy("d").limit(8).collect()
    println(s"[profile] non-identical hamming (lowest): " +
      hist.map(r0 => s"${r0.getInt(0)}x${r0.getLong(1)}").mkString(", "))
    spark.stop()
  }
}
