package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Stream-stream LEFT OUTER interval join: matched pairs emit like the
  * inner join; UNMATCHED left rows emit null-padded only once the
  * watermark proves no future right row can match them. That makes the
  * drained stream equal to the batch left outer join EXCEPT for
  * unmatched rows inside the final watermark window — the stream can
  * never rule out a late match for those, so it withholds them. This
  * spec pins all three parts: matched parity, null-padded parity below
  * the final watermark, and the withheld tail being exactly the
  * unmatched rows the watermark still covers.
  */
class StreamStreamOuterJoinSpec extends GraftTestBase {

  test("left outer interval join: matched parity + watermark-gated null padding") {
    def sides(streaming: Boolean) = {
      val base =
        if (streaming) EventsStream.readEvents(spark, sf001)
        else graft.Tables.normalizeTs(
          spark.read.schema(EventsStream.rawSchema)
            .parquet(s"$sf001/events.parquet"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      val clicks = base.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"),
          col("event_id").as("click_id"), col("ts").as("c_ts"))
      (purchases, clicks)
    }

    def outerJoin(p: org.apache.spark.sql.DataFrame,
                  c: org.apache.spark.sql.DataFrame) =
      p.join(c,
        col("user_id") === col("c_user_id") &&
          col("c_ts") >= col("p_ts") - expr("interval 5 minutes") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("p_ts"))

    type Row4 = (Long, Long, Long, Timestamp)
    def collect(df: org.apache.spark.sql.DataFrame): Seq[Row4] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getTimestamp(3))).toSeq.sortBy(t => (t._1, t._2, t._3))

    // ---- streaming, drained
    val (sp, sc) = sides(streaming = true)
    val q = outerJoin(
      sp.withWatermark("p_ts", "10 minutes"),
      sc.withWatermark("c_ts", "10 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssoj").start()
    q.processAllAvailable()
    q.stop()
    val got = collect(spark.table("ssoj"))

    // ---- batch twin + the final watermark position
    val (bp, bc) = sides(streaming = false)
    val want = collect(outerJoin(bp, bc))
    // the global watermark is the MIN across both sides' (max event
    // time - delay), and left-state eviction further accounts for the
    // join's 5-minute interval bound — use a conservative margin
    // rather than re-deriving the exact threshold
    val maxBySide = graft.Tables.normalizeTs(
        spark.read.schema(EventsStream.rawSchema)
          .parquet(s"$sf001/events.parquet"))
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy("event_type").agg(max(col("ts")).as("mx"))
      .collect().map(_.getTimestamp(1).getTime)
    val wmMs = maxBySide.min - (10 + 5 + 1) * 60 * 1000

    // matched rows emit immediately: exact parity
    assert(got.filter(_._3 != -1L) == want.filter(_._3 != -1L))
    // null-padded rows: parity below the final watermark...
    val gotNull = got.filter(_._3 == -1L)
    val wantNullOld = want.filter(r => r._3 == -1L && r._4.getTime < wmMs)
    assert(wantNullOld.toSet.subsetOf(gotNull.toSet),
      "every watermark-cleared unmatched purchase must be null-padded")
    // ...and everything the stream emitted exists in the batch result
    assert(gotNull.toSet.subsetOf(want.filter(_._3 == -1L).toSet))
    // the withheld tail is EXACTLY the unmatched rows the watermark
    // still covers (a late click could still match them)
    val withheld = want.filter(_._3 == -1L).toSet -- gotNull.toSet
    assert(withheld.forall(_._4.getTime >= wmMs),
      s"withheld rows below the watermark: $withheld")
    assert(gotNull.nonEmpty && got.exists(_._3 != -1L))
  }
}
