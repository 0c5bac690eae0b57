package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.GraftTestBase

/** Streaming observability: Dataset.observe() metrics surfaced through
  * StreamingQueryProgress and the StreamingQueryListener event bus —
  * in-flight data-quality monitoring without a second query or a
  * foreachBatch side channel. */
class StreamingObserveSpec extends GraftTestBase {

  test("observe() metrics reach query progress and the listener") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventsStream.rawSchema)
      .parquet(s"$sf001/events.parquet")

    val in = Files.createTempDirectory("obs_in").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("obs_cp").toFile.getAbsolutePath
    raw.coalesce(1).write.mode("overwrite").parquet(in)

    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val om = e.progress.observedMetrics
        if (om.containsKey("quality")) {
          val row = om.get("quality")
          seen.add((row.getLong(0), row.getLong(1)))
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.schema(EventsStream.rawSchema).parquet(in)
        .observe("quality",
          count(lit(1)).as("n_rows"),
          count(when(col("value") < 0, 1)).as("n_negative"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("complete").format("memory").queryName("obs_sink")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // progress objects on the query handle carry the metrics too
      val fromProgress = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("quality")))
        .map(r => (r.getLong(0), r.getLong(1)))
      val total = raw.count()
      val negatives = raw.filter(col("value") < 0).count()
      assert(fromProgress.map(_._1).sum == total,
        s"observed n_rows ${fromProgress.map(_._1).sum} != input $total")
      assert(fromProgress.map(_._2).sum == negatives)
      // the listener bus delivered the same rows (async — wait briefly)
      spark.streams.awaitAnyTermination(1)
      var waited = 0
      while (seen.isEmpty && waited < 50) { Thread.sleep(100); waited += 1 }
      val fromListener = seen.asScala.toSeq
      assert(fromListener.map(_._1).sum == total,
        s"listener metrics $fromListener")
    } finally spark.streams.removeListener(listener)
  }
}
