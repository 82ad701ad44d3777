package graft.sources

import graft.SparkSpecBase
import graft.mr.MapReduce
import java.nio.file.Files

/**
 * End-to-end replica of the reference client (`Search.cpp:91-117`): scan
 * directories, filter names containing the search word, count per name
 * across dirs, sort by name — checked against an in-memory Scala reference
 * implementation of the same semantics.
 */
class SearchE2eSpec extends SparkSpecBase {
  import spark.implicits._

  test("directory search pipeline matches an in-memory reference") {
    val d1 = Files.createTempDirectory("graft_e2e_a").toFile
    val d2 = Files.createTempDirectory("graft_e2e_b").toFile
    try {
      Seq("apple.txt", "grape.txt", "app.log").foreach(n =>
        Files.createFile(new java.io.File(d1, n).toPath))
      Seq("apple.txt", "pineapple.md", "kiwi.bin").foreach(n =>
        Files.createFile(new java.io.File(d2, n).toPath))
      val word = "app"

      val listing = Tables.dirListing(spark, Seq(d1.getPath, d2.getPath))
      // reference data model: (file_name, search_word) pairs (Search.cpp:104)
      val input = listing.select("file_name").as[String].map((_, word))
      val got = MapReduce.searchPipeline(input)(spark).collect().toSeq

      // in-memory reference of Search.cpp:65-78 + MapReduceFramework.cpp:341
      val names = Seq(d1, d2).flatMap(d => Seq(".", "..") ++ d.list().toSeq)
      val expected = names.filter(_.contains(word))
        .groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      assert(got == expected)
      // ".", ".." present in the listing exactly as readdir yields them
      assert(listing.filter($"file_name" === ".").count() == 2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(d1); rm(d2)
    }
  }
}
