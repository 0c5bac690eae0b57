package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.GraftTestBase

/** Event-time timers in transformWithState: a user whose events STOP
  * must still get their session closed — by handleExpiredTimer when the
  * watermark (advanced by OTHER users' events in a later batch) passes
  * the session's gap deadline. Input-driven state alone cannot do this. */
class TransformWithStateTimersSpec extends GraftTestBase {

  test("idle user's session is closed by the timer, active user's stays open") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    val base = 1700000000000L // fixed epoch ms
    def ts(offsetS: Long) = new Timestamp(base + offsetS * 1000)

    // Batch 1: user 1 sends two events. Batch 2: only user 2 sends,
    // an hour later — its events push the watermark far past user 1's
    // (last + 30 min gap) timer, so user 1 closes via timer while
    // user 2 (no watermark past ITS deadline yet) stays open.
    val dir = Files.createTempDirectory("tws_timer").toFile.getAbsolutePath
    Seq(("a", Seq((1L, ts(0)), (1L, ts(60)))),
        ("b", Seq((2L, ts(3600)), (2L, ts(3660))))).foreach { case (name, rows) =>
      val stage = s"$dir/_stage_$name"
      rows.toDF("user_id", "ts").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }

    val out = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "10 seconds")
      .as[TransformWithStateOps.TimedEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new TransformWithStateOps.TimerSessions(gapMs = 30 * 60 * 1000),
        TimeMode.EventTime(), OutputMode.Append(),
        org.apache.spark.sql.Encoders.product[TransformWithStateOps.SessClosed])
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("tws_timer_out").start()
    q.processAllAvailable()
    q.stop()

    val sink = spark.table("tws_timer_out").collect()
    val byUser = sink.groupBy(_.getLong(0))
    assert(byUser.contains(1L), s"user 1 session not closed by timer: ${sink.toSeq}")
    val u1 = byUser(1L)
    assert(u1.length == 1 && u1.head.getInt(2) == 2 &&
      u1.head.getString(3) == "timer" &&
      u1.head.getTimestamp(1) == ts(0))
    assert(!byUser.contains(2L), "user 2's open session leaked an emission")
  }
}
