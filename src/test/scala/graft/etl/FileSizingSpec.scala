package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** Output file sizing — the small-files problem is the #1 operational
  * failure mode of petabyte parquet lakes (every downstream scan pays
  * per-file open/footer costs). Two controls, both tested:
  * maxRecordsPerFile caps file size on a SINGLE writer task, and
  * repartition-before-write sets the file COUNT (one file per
  * partition) for compaction jobs. */
class FileSizingSpec extends GraftTestBase {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && f.getName.startsWith("part-"))

  test("maxRecordsPerFile splits oversized writer tasks") {
    val dir = Files.createTempDirectory("sizing").resolve("capped").toString
    Tables(spark, sf001)("lineitem").coalesce(1)
      .write.option("maxRecordsPerFile", 1000).parquet(dir)
    val files = parquetFiles(dir)
    // ~6k rows / 1000 cap → at least 6 files from ONE task
    assert(files.size >= 6, s"expected >= 6 capped files, got ${files.size}")
    val back = spark.read.parquet(dir)
    assert(back.count() == Tables(spark, sf001)("lineitem").count())
  }

  test("compaction: repartition-before-write controls the file count") {
    val src = Files.createTempDirectory("sizing").resolve("fragmented").toString
    // Simulate a fragmented ingest: 64 tiny files.
    Tables(spark, sf001)("lineitem").repartition(64).write.parquet(src)
    assert(parquetFiles(src).size == 64)

    val out = Files.createTempDirectory("sizing").resolve("compacted").toString
    val frag = spark.read.parquet(src)
    frag.repartition(2).write.parquet(out)
    assert(parquetFiles(out).size == 2)
    assert(spark.read.parquet(out).exceptAll(frag).isEmpty)
  }

  test("partitionBy + repartition on the partition key yields one file per partition dir") {
    val out = Files.createTempDirectory("sizing").resolve("bykey").toString
    Tables(spark, sf001)("lineitem")
      .repartition(col("l_returnflag"))
      .write.partitionBy("l_returnflag").parquet(out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("l_returnflag=")).toSeq
    assert(dirs.size == 3) // A, N, R
    dirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName}: expected 1 compacted file, got $files")
    }
  }
}
