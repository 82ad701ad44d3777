package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Caches, Dedup}

/** Throwaway probe for the dedup_auto attribution (round 16). */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          val wall = for {
            a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
          } yield a - b
          stageLog.add((s.stageInfo.stageId,
            s.stageInfo.name.takeWhile(_ != '\n').take(60),
            s.stageInfo.numTasks, wall.getOrElse(-1L),
            s.stageInfo.taskMetrics.executorRunTime))
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      })
    def dumpStages(tag: String): Unit = {
      val all = scala.jdk.CollectionConverters.IteratorHasAsScala(
        stageLog.iterator()).asScala.toSeq.sortBy(_._1)
      all.foreach { case (id, nm, nt, wall, run) =>
        println(f"[stage] $tag id=$id%-4d tasks=$nt%-3d wall=${wall}%-6d " +
          f"run=${run}%-7d $nm")
      }
      stageLog.clear()
    }
    def time[A](name: String)(f: => A): A = {
      val j0 = jobs.get; val s0 = stages.get; val t0n = tasks.get
      val m0 = taskMs.get
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jobs.get - j0} stages=${stages.get - s0} " +
        f"tasks=${tasks.get - t0n} taskSec=${(taskMs.get - m0) / 1e3}%.2f"); r
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_CNT")) {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      println("[cnt] li distinct (ok,pk) = " + li.count())
      val e = li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
      println("[cnt] copurchase pairs (with dup) = " + e.count())
      println("[cnt] copurchase distinct edges = " +
        e.select("src", "dst").distinct().count())
      println("[cnt] nodes = " +
        e.select(col("src").as("n")).distinct().count())
      spark.stop(); return
    }

    if (sys.env.contains("SPARK_GRAFT_PROBE_PR")) {
      import graft.operators.Graph
      (1 to 3).foreach { i =>
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val e = li.select(col("ok"), col("pk").as("src"))
          .join(li.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") =!= col("dst"))
          .select("src", "dst")
        if (i == 3) stageLog.clear()
        val pr = time(s"rep$i pageRank build+loop")(
          Graph.pageRank(e, iterations = 5))
        time(s"rep$i pageRank write")(
          pr.orderBy("node").write.format("noop").mode("overwrite").save())
        if (i == 3) dumpStages("pr")
        graft.Bench.drain(spark)
      }
      spark.stop(); return
    }

    if (sys.env.contains("SPARK_GRAFT_PROBE_LV2")) {
      import graft.operators.{Caches, Graph}
      (1 to 3).foreach { i =>
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val e = li.select(col("ok"), col("pk").as("src"))
          .join(li.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") =!= col("dst"))
          .select("src", "dst").distinct()
        if (i == 3) stageLog.clear()
        val (l1, base) = time(s"rep$i louvainMoveWithBase")(
          Graph.louvainMoveWithBase(e, iterations = 3, symmetric = true))
        if (i == 3) dumpStages("loop")
        val g2 = time(s"rep$i coarsen (eager mixing)")(
          Graph.coarsen(base.select("src", "dst"), l1))
        if (i == 3) dumpStages("coarsen")
        val l2 = time(s"rep$i l2 local move")(
          Graph.louvainMoveWeighted(g2, iterations = 2, weight = "weight",
            symmetric = true, localEdgeCap = 1000000L))
        if (i == 3) dumpStages("l2")
        time(s"rep$i modTotalFromCoarse write")(
          Graph.modularityTotalFromCoarse(g2, l2)
            .write.format("noop").mode("overwrite").save())
        if (i == 3) dumpStages("modq")
        graft.Bench.drain(spark)
      }
      spark.stop(); return
    }

    val docs = Tables.documents(spark, sfDir)
    time("warmup count")(docs.count())

    if (sys.env.contains("SPARK_GRAFT_PROBE_CAND")) {
      import graft.functions.TextFunctions._
      val rawSets = docs.select(col("doc_id"),
        array_distinct(shingleHashes(col("text"), 3)).as("sh0")).persist()
      val post0 = rawSets.select(col("doc_id"), explode(col("sh0")).as("s"))
      val dfTable = post0.groupBy("s").agg(count(lit(1)).as("df")).persist()
      println("[cand] docs=" + rawSets.count())
      println("[cand] distinct shingles=" + dfTable.count())
      println("[cand] hot(df>1000)=" + dfTable.filter(col("df") > 1000).count())
      val shSets = rawSets.select(col("doc_id"), col("sh0").as("sh"))
        .withColumn("n_sh", size(col("sh"))).filter(col("n_sh") > 0).persist()
      println("[cand] n_sh stats=" + shSets.agg(min("n_sh"), avg("n_sh"),
        max("n_sh"), sum("n_sh")).collect().mkString)
      val nSh = size(col("ordered"))
      val prefixLen = nSh - ceil(nSh * 0.5 - lit(1e-9)).cast("int") + 1
      val prefixes = shSets.select(col("doc_id"), explode(col("sh")).as("s"))
        .join(dfTable, "s")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ordered"))
        .select(col("doc_id"), prefixLen.as("plen"),
          posexplode(col("ordered")).as(Seq("pos", "o")))
        .filter(col("pos") < col("plen"))
        .select(col("doc_id"), col("o").getField("s").as("s")).persist()
      println("[cand] prefix postings=" + prefixes.count())
      val l = prefixes.select(col("s"), col("doc_id").as("doc_a"))
      val r = prefixes.select(col("s"), col("doc_id").as("doc_b"))
      val rawCand = l.join(r, "s").filter(col("doc_a") < col("doc_b"))
      println("[cand] raw candidates=" + rawCand.count())
      val cand = rawCand.select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b").persist()
      println("[cand] distinct candidates=" + cand.count())
      val withLen = cand
        .join(shSets.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
        .join(shSets.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      println("[cand] length-compatible (min>=t*max)=" + withLen
        .filter(col("n_a") >= col("n_b") * 0.5 && col("n_b") >= col("n_a") * 0.5)
        .count())
      println("[cand] intersect work Sum(n_a+n_b)=" + withLen
        .agg(sum(col("n_a") + col("n_b"))).collect().mkString)
      spark.stop(); return
    }

    (1 to 3).foreach { i =>
      val plan = time(s"rep$i nearDupAuto build")(
        Dedup.nearDupAuto(docs, k = 3, threshold = 0.5))
      println(s"[probe] rep$i engine=${plan.engine} dupFrac=${plan.dupFraction} " +
        s"sampled=${plan.sampledDocs} memoSize=${Dedup.dupSampleCacheSize}")
      val pairs = plan.pairs.select("doc_a", "doc_b")
      val losers = time(s"rep$i duplicateClusters")(
        Dedup.duplicateClusters(pairs, loopParts = 1)
          .filter(col("doc_id") =!= col("cluster")))
      time(s"rep$i survivors write")(
        docs.join(losers, Seq("doc_id"), "left_anti").select("doc_id")
          .write.format("noop").mode("overwrite").save())
      graft.Bench.drain(spark)
    }
    // same protocol for the plain survivors (prefix engine) for contrast
    (1 to 2).foreach { i =>
      if (i == 2) stageLog.clear()
      val pairs = time(s"srv$i ngramJaccard build")(
        Dedup.ngramJaccard(docs, k = 3, threshold = 0.5, maxShingleDf = 1000,
          hashShingles = true, prefixFilter = true).select("doc_a", "doc_b"))
      val losers = time(s"srv$i duplicateClusters")(
        Dedup.duplicateClusters(pairs, loopParts = 1)
          .filter(col("doc_id") =!= col("cluster")))
      time(s"srv$i survivors write")(
        docs.join(losers, Seq("doc_id"), "left_anti").select("doc_id")
          .write.format("noop").mode("overwrite").save())
      if (i == 2) dumpStages("srv2")
      graft.Bench.drain(spark)
    }
    spark.stop()
  }
}
