package graft.multimodal

import org.apache.spark.sql.functions._

import graft.GraftTestBase

class MultimodalSpec extends GraftTestBase {
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    graft.Tables(spark, sf001)("documents"))

  test("media table has opaque binary payloads + typed metadata struct") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val row = media.orderBy("media_id").select("content").head()
    assert(row.getAs[Array[Byte]](0).nonEmpty)
  }

  test("binary payload round-trips: checksum over bytes matches a driver-side recompute") {
    val doc = graft.Tables(spark, sf001)("documents")
      .orderBy("doc_id").select("doc_id", "text").head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    var want = 0L
    bytes.zipWithIndex.foreach { case (b, i) => want += (b & 0xFF).toLong * (i + 1) }
    val got = Multimodal.extractFeatures(media)
      .filter(col("media_id") === doc.getLong(0))
      .head().checksum
    assert(got == want)
  }

  test("feature extraction is partition-count invariant (no per-partition state leaks)") {
    val a = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(media.repartition(13)).orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("resize truncates payloads and reports sizes") {
    val out = Multimodal.resizePayload(media, maxBytes = 100)
      .filter(col("orig_bytes") > 100).head()
    assert(out.getAs[Array[Byte]]("content").length == 100)
    assert(out.getAs[Int]("new_bytes") == 100)
  }

  test("frame sampling only emits video rows at the stride") {
    val frames = Multimodal.sampleFrames(Multimodal.extractFeatures(media), stride = 6)
    val byMedia = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"), first("n_frames").as("nf")).collect()
    byMedia.foreach { r =>
      val expect = (0 until r.getAs[Int]("nf") by 6).size
      assert(r.getAs[Long]("n") == expect)
    }
    // video kind only: media_id % 3 == 2
    assert(frames.filter(pmod(col("media_id"), lit(3)) =!= 2).count() == 0)
  }

  test("audio energy windows cover every byte and match a driver recompute") {
    val w = 32
    val doc = graft.Tables(spark, sf001)("documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .orderBy("doc_id").select("doc_id", "text").head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val want = bytes.grouped(w).map { chunk =>
      chunk.map { b => val v = (b & 0xFF) - 128; v.toLong * v }.sum
    }.toSeq
    val got = Multimodal.audioEnergy(media, window = w)
      .filter(col("media_id") === doc.getLong(0))
      .orderBy("window_idx")
      .collect()
    assert(got.map(_.getLong(3)).toSeq == want)
    // coverage: window sample counts sum to the payload length
    assert(got.map(_.getInt(2)).sum == bytes.length)
    // audio kind only: media_id % 3 == 1
    val all = Multimodal.audioEnergy(media, window = w)
    assert(all.filter(pmod(col("media_id"), lit(3)) =!= 1).count() == 0)
  }

  test("image near-dup hot-bucket cap kills an identical-payload flood") {
    // 300 identical "images" (media_id ≡ 0 mod 3 ⇒ kind image) share
    // every fingerprint chunk → 4 flooded buckets; plus one cold pair
    // of a distinct payload. Capped, only the cold pair survives —
    // and the test runtime itself proves no 300²/2 pair blowup ran.
    val boiler = ("license header boilerplate " * 20)
    val other = "a genuinely distinctive photograph description " * 9
    val rows = (0L until 900L by 3L).map(i => (i, boiler)) ++
      Seq((900L, other), (903L, other))
    val docs = rows.toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val m = Multimodal.mediaFromDocuments(docs)
    val capped = Multimodal.imageNearDup(m, maxHamming = 6, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((900L, 903L)))
    // uncapped on a small slice: the boilerplate DOES pair (the cap is
    // a real behavioral difference, not dead code)
    val slice = Multimodal.mediaFromDocuments(docs.filter($"doc_id" < 30))
    val un = Multimodal.imageNearDup(slice, maxHamming = 6)
      .collect()
    assert(un.length == 10 * 9 / 2)
  }
}
