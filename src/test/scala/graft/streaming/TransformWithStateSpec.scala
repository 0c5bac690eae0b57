package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** transformWithState (Spark 4 arbitrary-state API): multi-batch state
  * accumulation and final-emission correctness against the batch
  * aggregate. Events are re-written as TWO parquet files consumed one
  * per micro-batch (maxFilesPerTrigger=1), so ValueState/MapState must
  * survive and merge across batches — the single-file drain in
  * q84_tws_profile can't distinguish stateless from stateful. */
class TransformWithStateSpec extends GraftTestBase {

  test("per-user profile accumulates across micro-batches and matches batch agg") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventsStream.rawSchema)
      .parquet(s"$sf001/events.parquet")

    // Two half-files FLAT in one stream dir (nested write dirs would be
    // swept up in a single trigger); stream them one per batch.
    val dir = Files.createTempDirectory("tws_in").toFile.getAbsolutePath
    Seq("a" -> (0 to 0), "b" -> (1 to 1)).foreach { case (name, par) =>
      val tmp = s"$dir/_stage_$name"
      raw.filter(col("event_id") % 2 === par.head).coalesce(1)
        .write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val out = spark.readStream
      .schema(EventsStream.rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[TransformWithStateOps.EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new TransformWithStateOps.RunningUserProfile,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update(),
        org.apache.spark.sql.Encoders.product[TransformWithStateOps.UserOut])
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("tws_spec_out").start()
    q.processAllAvailable()
    q.stop()

    val sink = spark.table("tws_spec_out")
    // Users present in both half-files must have emitted twice with
    // increasing n_events — proof the second batch saw first-batch state.
    val perUserEmits = sink.groupBy("user_id").count()
      .filter(col("count") >= 2).count()
    assert(perUserEmits > 0, "no user emitted in two separate micro-batches")

    val finalRows = sink.groupBy(col("user_id"))
      .agg(max_by(struct(col("n_events"), col("sum_value"), col("n_types")),
        col("n_events")).as("f"))
      .select(col("user_id"), col("f.n_events").as("n_events"),
              round(col("f.sum_value"), 4).as("sum_value"),
              col("f.n_types").as("n_types"))
    val expected = raw
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"),
           countDistinct(col("event_type")).cast("int").as("n_types"))
    assert(finalRows.exceptAll(expected).isEmpty &&
           expected.exceptAll(finalRows).isEmpty,
      "final TWS state differs from batch aggregate")
  }
}
