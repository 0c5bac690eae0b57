package graft.sources

import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.GraftTestBase

/** Streaming WRITE path of the graftmem DSv2 sink: writeStream into the
  * custom connector, per-epoch atomic commits, replayed-epoch dedup. */
class GraftMemoryStreamWriteSpec extends GraftTestBase {

  test("writeStream drains the range stream into the sink exactly once") {
    GraftMemoryStore.drop("sw_out")
    val q = spark.readStream
      .format("graft.sources.GraftRangeSource")
      .option("start", "0").option("end", "600")
      .option("slices", "3").option("rowsPerBatch", "200")
      .load()
      .writeStream.format("graft.sources.GraftMemorySink")
      .option("name", "sw_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sw_ckpt").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val got = GraftMemoryStore.rowsOf("sw_out").map(_.head.asInstanceOf[Long])
    assert(got.size == 600)
    assert(got.toSet == (0L until 600L).toSet)
    // several epochs actually committed (not one giant batch)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
  }

  test("a replayed epoch commits no duplicate rows") {
    GraftMemoryStore.drop("sw_replay")
    val schema = StructType(Seq(StructField("v", LongType)))
    val sw = new GraftMemoryStreamingWrite("sw_replay", schema)
    val msgs: Array[WriterCommitMessage] =
      Array(GraftMemoryCommit(Vector(Seq(1L), Seq(2L))))
    sw.commit(0L, msgs)
    sw.commit(0L, msgs) // restart replays the last epoch
    sw.commit(1L, Array(GraftMemoryCommit(Vector(Seq(3L)))))
    assert(GraftMemoryStore.rowsOf("sw_replay").map(_.head) ==
      Vector(1L, 2L, 3L))
  }
}
