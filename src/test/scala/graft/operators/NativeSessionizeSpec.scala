package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** The native SessionId window function must be bit-identical to the
  * composed lag + running-sum pair AND structurally cheaper: one
  * Window operator instead of two over the same sort. */
class NativeSessionizeSpec extends GraftTestBase {

  private lazy val events = Tables(spark, sf001)("events")

  test("native session ids equal the composed lag+sum form on real events") {
    val a = Sessionize.sessionize(events, "user_id", "ts", "event_id", 1800)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id").collect().map(_.toString)
    val b = Sessionize.sessionizeNative(events, "user_id", "ts", "event_id", 1800)
      .select("user_id", "event_id", "session_id")
      .orderBy("user_id", "event_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("native form plans ONE Window operator, composed form plans two") {
    def windows(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case other => other
      }
      p.collect { case w: WindowExec => w }.size
    }
    assert(windows(Sessionize.sessionizeNative(
      events, "user_id", "ts", "event_id", 1800)) == 1)
    assert(windows(Sessionize.sessionize(
      events, "user_id", "ts", "event_id", 1800)) == 2)
  }

  test("gap boundary semantics: exactly-gap stays, gap+1us splits") {
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    val rows = Seq(
      (1L, 1L, base),
      (1L, 2L, base + 1800L * 1000000L),      // exactly gap -> same session
      (1L, 3L, base + 3600L * 1000000L + 1L)) // gap + 1us   -> new session
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val got = Sessionize.sessionizeNative(rows, "user_id", "ts", "event_id", 1800)
      .orderBy("event_id").collect().map(_.getAs[Long]("session_id")).toSeq
    assert(got == Seq(1L, 1L, 2L))
  }
}
