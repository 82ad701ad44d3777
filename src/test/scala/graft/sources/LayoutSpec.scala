package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Storage-layout levers for the 100 TB deployment — the write side of the
 * engine. Two properties a cluster job lives or dies by, asserted on real
 * written-and-read-back data:
 *
 *  - BUCKETED tables co-locate join keys at WRITE time: a join of two
 *    tables bucketed by the same key into the same bucket count needs NO
 *    shuffle at read time (the recurring-join amortization: shuffle once
 *    when writing, join shuffle-free forever after);
 *  - PARTITIONED tables prune whole directories at plan time: a filter on
 *    the partition column never touches non-matching files (the scan shows
 *    it as PartitionFilters, distinct from row-level PushedFilters).
 *
 * Both go through the session catalog (`saveAsTable`) because bucketing
 * metadata lives in the catalog, not in parquet footers.
 */
class LayoutSpec extends SparkSpecBase {

  test("bucketed-by-join-key tables join with ZERO shuffle") {
    // managed tables land in the session warehouse and are dropped (files
    // included) in the finally below
    // disable broadcast so the join would otherwise be a shuffle join
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      val ord = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is still the correct join
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
      assert(expect > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("partitioned writes prune non-matching partitions at plan time") {
    val dir = Files.createTempDirectory("graft_partitioned").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/li_by_flag"
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)

    val q = spark.read.parquet(path).filter(col("l_returnflag") === "R")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("l_returnflag"), p)
    // the pruned scan reads exactly the one directory's rows
    val expect = Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "R").count()
    assert(q.count() == expect)
    assert(expect > 0)
  }

  test("Z-order clustering: a second-column predicate can skip files a linear sort cannot") {
    // The multi-column pruning lever: 64×64 grid (one row per (x, y)),
    // written 16 files two ways. Linearly range-partitioned by x, every
    // file is an x-stripe spanning the FULL y range, so the y < 8
    // predicate overlaps every file's [min(y), max(y)] — a stats-based
    // reader (parquet row groups, manifest min/max) can skip nothing.
    // Z-ordered, contiguous key ranges are axis-aligned tiles, so the same
    // predicate overlaps only the bottom-row tiles. The assertion reads
    // each written FILE's actual min/max — exactly the stats any pruning
    // reader consults — not a plan string.
    val dir = Files.createTempDirectory("graft_zorder").toFile
    dir.deleteOnExit()
    val (pLin, pZ) = (dir.getAbsolutePath + "/lin", dir.getAbsolutePath + "/zord")
    val grid = spark.range(0, 64).select(col("id").as("x"))
      .crossJoin(spark.range(0, 64).select(col("id").as("y")))
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(pLin)
    Layout.zordered(grid, Seq(col("x"), col("y")), nFiles = 16, bits = 6)
      .write.mode("overwrite").parquet(pZ)

    // files whose y-stats overlap the predicate y < 8 (nonEmpty guards
    // against 0-row part files from empty range partitions)
    def overlapping(path: String): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val stats = files.flatMap { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).collect().head
        if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
      }
      (stats.count { case (mn, _) => mn < 8 }, stats.length)
    }
    val (linHit, linFiles) = overlapping(pLin)
    val (zHit, zFiles) = overlapping(pZ)
    assert(linFiles >= 8 && zFiles >= 8, s"degenerate file counts: $linFiles/$zFiles")
    assert(linHit == linFiles,
      s"x-stripes must span all y — every file should overlap ($linHit of $linFiles)")
    assert(zHit <= zFiles / 2 && zHit >= 1,
      s"z-order should confine y < 8 to the bottom tiles ($zHit of $zFiles)")
    // layout must never change the data: both read back to the same grid
    assert(spark.read.parquet(pZ).count() == 64L * 64L)
    assert(spark.read.parquet(pZ).except(grid).count() == 0L)
    assert(grid.except(spark.read.parquet(pZ)).count() == 0L)
    // and the key is native unrolled arithmetic — no lambda, no UDF
    val kp = grid.select(Layout.zorderKey(Seq(col("x"), col("y")), 6))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!kp.contains("lambdafunction"), kp)
    assert(!kp.toLowerCase.contains("scalaudf"), kp)
  }

  test("compact: many tiny files rewrite to ceil(n/target); sorted mode keeps pruning stats") {
    val dir = Files.createTempDirectory("graft_compact").toFile
    dir.deleteOnExit()
    val (pSmall, pOut, pSorted) = (dir.getAbsolutePath + "/small",
      dir.getAbsolutePath + "/out", dir.getAbsolutePath + "/sorted")
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    // the ingest pathology: 64 files of ~16 rows each
    spark.range(0, 1024).select(col("id").as("k"))
      .repartition(64).write.mode("overwrite").parquet(pSmall)
    assert(parquetFiles(pSmall).length == 64)
    val small = spark.read.parquet(pSmall)

    // round-robin compaction: 1024/400 → 3 files, identical data
    Layout.compact(small, targetRows = 400)
      .write.mode("overwrite").parquet(pOut)
    assert(parquetFiles(pOut).length == 3)
    val back = spark.read.parquet(pOut)
    assert(back.count() == 1024 && back.except(small).count() == 0 &&
      small.except(back).count() == 0)

    // sorted compaction: files carry DISJOINT key ranges — the rewrite
    // establishes the min/max-stats clustering a pruning reader uses
    Layout.compact(small, targetRows = 300, sortCols = Seq(col("k")))
      .write.mode("overwrite").parquet(pSorted)
    val ranges = parquetFiles(pSorted).toSeq.flatMap { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("k"), max("k")).collect().head
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    }.sorted
    assert(ranges.size >= 3)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping compacted ranges: $ranges")
    }
  }

  test("schema evolution: mergeSchema unions old and new file schemas on read") {
    // a 100 TB table accretes columns over years of writes — old files
    // must stay readable next to new ones, with the missing column null
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/docs_evolving"
    // epoch 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(path)
    // epoch 2: adds a quality column
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(path)

    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "quality", "text"))
    val rows = merged.select("doc_id", "quality")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "old files must read null quality")
    assert(rows(3L).contains(0.9))
    // and the evolved table still serves the engine's operators
    assert(merged.filter(col("quality").isNull).count() == 2)
  }
}
