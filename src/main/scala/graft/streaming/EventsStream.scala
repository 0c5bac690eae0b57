package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the `events` table.
  *
  * The reference is pure batch (SURVEY.md §2.9) — this is the planned
  * streaming extension: the same tumbling-window aggregate as the batch
  * query q32, run through readStream → groupBy(window) → memory sink, so
  * batch and stream results are directly comparable (and share one
  * DuckDB oracle).
  */
object EventsStream {

  /** Explicit schema for the streaming source (file streams can't infer):
    * `ts` arrives as raw nanos (legacy nanosAsLong) and is converted with
    * integer division, mirroring Tables.events. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // File-stream sources need a directory basePath; the testdata dir
    // holds one file per table, so glob-filter down to events.parquet.
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling-window counts/sums per event type (batch-q32 twin).
    * `complete` mode + memory sink: every window is emitted once the
    * (finite) file stream drains, so the result equals the batch agg. */
  def windowedAggToMemory(spark: SparkSession, dir: String,
                          queryName: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), round(col("sum_value"), 4).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Watermarked append-mode variant (the production streaming shape:
    * bounded state, late data dropped past the watermark). Used by
    * StreamingSpec; a finite file stream in append mode only emits
    * windows the watermark has passed. */
  def watermarkedWindowAgg(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), round(col("sum_value"), 4).as("sum_value"))
}
