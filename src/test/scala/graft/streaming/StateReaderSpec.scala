package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftTestBase

/** The state data source (Spark 4): a checkpointed streaming query's
  * STATE read back as a plain batch DataFrame — the operability surface
  * for debugging stuck aggregations, auditing state size, and seeding
  * migrations, without touching the running query.
  *
  *   spark.read.format("statestore").load(ckpt)        — the state rows
  *   spark.read.format("state-metadata").load(ckpt)    — operator map
  */
class StateReaderSpec extends GraftTestBase {

  test("statestore reader returns the aggregation state; state-metadata lists the operator") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventsStream.rawSchema)
      .parquet(s"$sf001/events.parquet")

    val in = Files.createTempDirectory("ssr_in").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("ssr_cp").toFile.getAbsolutePath
    raw.coalesce(1).write.mode("overwrite").parquet(in)

    // a keyed streaming aggregation -> HashAggregate state per key
    val q = spark.readStream.schema(EventsStream.rawSchema).parquet(in)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete").format("memory").queryName("ssr_sink")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // ---- state-metadata: one stateful operator, its name and id
    val meta = spark.read.format("state-metadata").load(cp)
    val ops = meta.select("operatorId", "operatorName").distinct().collect()
    assert(ops.length == 1)
    assert(ops.head.getString(1) == "stateStoreSave")

    // ---- statestore: key/value state rows == the batch aggregate
    val state = spark.read.format("statestore").load(cp)
      .select(col("key.event_type").as("event_type"),
        col("value.count").as("n"))
    val got = state.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expected = raw.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expected,
      s"state rows $got != batch aggregate $expected")

    // every state row carries its shuffle partition id (audit surface)
    val parts = spark.read.format("statestore").load(cp)
      .select("partition_id").distinct().count()
    assert(parts >= 1)
  }

  test("statestore reader can pin an earlier batch of a multi-batch query") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.schema(EventsStream.rawSchema)
      .parquet(s"$sf001/events.parquet")

    val in = Files.createTempDirectory("ssr2_in").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("ssr2_cp").toFile.getAbsolutePath

    def addHalf(name: String, parity: Int): Unit = {
      val tmp = s"$in/_stage_$name"
      raw.filter(col("event_id") % 2 === parity).coalesce(1)
        .write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$in/$name.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    def drain(): Unit = {
      val q = spark.readStream.schema(EventsStream.rawSchema).parquet(in)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("complete").format("memory").queryName("ssr2_sink")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    addHalf("a", 0); drain()
    addHalf("b", 1); drain()

    def totalAt(batchId: Long): Long =
      spark.read.format("statestore")
        .option("batchId", batchId).load(cp)
        .agg(sum(col("value.count"))).head.getLong(0)

    val evens = raw.filter(col("event_id") % 2 === 0).count()
    val all = raw.count()
    assert(totalAt(0) == evens, "batch 0 state == first half only")
    val lastBatch = spark.read.format("state-metadata").load(cp)
      .agg(max(col("maxBatchId"))).head.getLong(0)
    assert(totalAt(lastBatch) == all, "final state == full input")
  }
}
