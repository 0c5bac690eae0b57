package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftTestBase

/** Checkpointed restart — the property that makes streaming jobs
  * operable: offsets + state live in the checkpoint, so a stopped query
  * restarted against the same checkpoint resumes EXACTLY where it left
  * off (no reprocessing, no lost state), even under a different sink
  * query. Also exercises Trigger.AvailableNow, the production batch-
  * drain trigger (terminates once caught up, unlike processAllAvailable
  * which is test-only API).
  */
class CheckpointResumeSpec extends GraftTestBase {

  test("restart from checkpoint: state resumes, already-read files are not reprocessed") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventsStream.rawSchema)
      .parquet(s"$sf001/events.parquet")

    val in = Files.createTempDirectory("cpr_in").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("cpr_cp").toFile.getAbsolutePath

    def addHalf(name: String, parity: Int): Long = {
      val half = raw.filter(col("event_id") % 2 === parity)
      val tmp = s"$in/_stage_$name"
      half.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$in/$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      half.count()
    }

    def runOnce(sinkName: String): org.apache.spark.sql.streaming.StreamingQuery = {
      val agg = spark.readStream.schema(EventsStream.rawSchema)
        .parquet(in)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      agg.writeStream
        .outputMode("complete").format("memory").queryName(sinkName)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    val nA = addHalf("a", 0)
    val q1 = runOnce("cpr_run1")
    q1.awaitTermination()
    val run1Rows = q1.recentProgress.map(_.numInputRows).sum
    assert(run1Rows == nA, s"run1 read $run1Rows rows, expected $nA")

    val nB = addHalf("b", 1)
    val q2 = runOnce("cpr_run2")
    q2.awaitTermination()
    // ONLY the new file is read — offsets came from the checkpoint
    val run2Rows = q2.recentProgress.map(_.numInputRows).sum
    assert(run2Rows == nB,
      s"run2 reprocessed: read $run2Rows rows, expected only $nB new")

    // and the emitted state covers BOTH halves — restored, then extended
    val got = spark.table("cpr_run2")
    val expected = raw.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "post-restart state differs from the full batch aggregate")
  }
}
