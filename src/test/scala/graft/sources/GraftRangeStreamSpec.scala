package graft.sources

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** DSv2 streaming read: the graftrange connector as a micro-batch
  * source. Asserts the offset contract actually batches (multiple
  * triggers, not one big gulp), that the drained stream equals the
  * batch read bit-for-bit, and that column pruning + filter pushdown
  * compose with streaming.
  */
class GraftRangeStreamSpec extends GraftTestBase {

  private def streamDf() = spark.readStream
    .format("graft.sources.GraftRangeSource")
    .option("start", "0").option("end", "500")
    .option("slices", "4").option("rowsPerBatch", "120")
    .load()

  test("micro-batch drain equals the batch read, in several batches") {
    val q = streamDf()
      .writeStream.format("memory").queryName("grs_stream_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("grs_stream_out")
    assert(got.count() == 500)
    // content parity with the batch read (same generator, same ids)
    val batch = spark.read.format("graft.sources.GraftRangeSource")
      .option("start", "0").option("end", "500").load()
    assert(got.orderBy("id").collect().toSeq ==
      batch.orderBy("id").collect().toSeq)
    // 500 rows / 120 per trigger -> at least 4 non-empty micro-batches
    val batches = spark.table("grs_stream_out").groupBy().count() // noop use
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(nBatches >= 4, s"expected >=4 micro-batches, saw $nBatches")
  }

  test("filter pushdown narrows the streamed range at planning time") {
    val q = streamDf().filter(col("id") >= 400) // bounds -> [400, 500)
      .select("id")
      .writeStream.format("memory").queryName("grs_stream_filtered")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    import spark.implicits._
    val ids = spark.table("grs_stream_filtered").as[Long].collect().sorted
    assert(ids.toSeq == (400L until 500L))
  }

  test("offsets survive checkpointed restart without reprocessing") {
    val ckpt = java.nio.file.Files.createTempDirectory("grs_ckpt").toString
    def run(): Long = {
      // memory sink refuses checkpoint recovery; foreachBatch is the
      // recoverable sink shape
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = streamDf()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      seen.get()
    }
    val first = run()
    assert(first == 500, s"first run should ingest all 500, got $first")
    // restart from the same checkpoint: the WAL says everything is
    // committed; a fresh stream instance must replay NOTHING
    val second = run()
    assert(second == 0, s"restart reprocessed $second rows")
  }
}
