package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.sources.GraftCatalog

/** The streaming-upsert pattern: foreachBatch runs MERGE INTO a
  * catalog table per micro-batch — how a CDC stream maintains a
  * serving table with row-level operations instead of blind appends.
  * Each batch's rows upsert by key (latest value wins within the
  * batch via max_by), so replays of the same key converge instead of
  * duplicating. */
class StreamingUpsertSpec extends GraftTestBase {

  test("foreachBatch MERGE INTO maintains a keyed serving table") {
    spark.conf.set("spark.sql.catalog.gcat2", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat2.db")
    spark.sql("DROP TABLE IF EXISTS gcat2.db.serving")
    spark.sql("CREATE TABLE gcat2.db.serving (k BIGINT, latest BIGINT)")

    val q = spark.readStream
      .format("graft.sources.GraftRangeSource")
      .option("start", "0").option("end", "300")
      .option("slices", "3").option("rowsPerBatch", "100")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // key = id % 20 - later batches overwrite earlier values
        batch.select((col("id") % 20).as("k"), col("id").as("v"))
          .groupBy("k").agg(expr("max_by(v, v)").as("v"))
          .createOrReplaceTempView("updates")
        batch.sparkSession.sql(
          """MERGE INTO gcat2.db.serving t
             USING updates s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET latest = s.v
             WHEN NOT MATCHED THEN INSERT (k, latest) VALUES (s.k, s.v)""")
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("upsert_ckpt").toString)
      .start()
    q.processAllAvailable(); q.stop()

    val got = spark.sql("SELECT k, latest FROM gcat2.db.serving ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every key holds its LATEST observed value: max id with id%20==k
    val want = (0L until 20L).map(k => (k, 280L + k))
    assert(got.toSeq == want)
    // exactly one row per key - replay/merge converged, no dup growth
    assert(spark.sql("SELECT count(*) FROM gcat2.db.serving")
      .head.getLong(0) == 20)
  }
}
