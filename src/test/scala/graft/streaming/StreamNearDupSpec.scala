package graft.streaming

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}
import graft.functions.TextFunctions
import graft.operators.Dedup

/** The streaming gate must flag exactly the pairs its batch twin finds:
  * a finite drained file stream is semantically a batch, so any
  * difference is a bug in the stream-static plumbing (lost band rows,
  * state mishandling, schema drift). */
class StreamNearDupSpec extends GraftTestBase {

  private def batchTwin = {
    val universe = Tables(spark, sf001)("documents")
      .filter(pmod(col("doc_id"), lit(5)) === 0 && length(col("text")) >= 5)
    def sigs(half: Int) = Dedup.minhashSignaturesComposed(
      universe.filter(pmod(col("doc_id"), lit(10)) === half)
        .select(col("doc_id"),
          TextFunctions.charShingles(col("text"), 5).as("__sh")),
      "doc_id", "__sh", 16, Dedup.mdBaseHash)
    val in = Dedup.bandRows(sigs(5), "doc_id", 16, 4,
        hashBandKeys = false, carrySig = true)
      .select(col("doc_id").as("in_id"), col("sig").as("sig_in"),
        col("band_idx"), col("band_key"))
    val idx = Dedup.bandRows(sigs(0), "doc_id", 16, 4, hashBandKeys = false,
        carrySig = true)
      .select(col("doc_id").as("idx_id"), col("sig").as("sig_idx"),
        col("band_idx"), col("band_key"))
    val est = size(filter(
      zip_with(col("sig_in"), col("sig_idx"), (x, y) => x === y),
      b => b)).cast("double") / lit(16.0)
    in.join(idx, Seq("band_idx", "band_key"))
      .select(col("in_id"), col("idx_id"), est.as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.2)
      .dropDuplicates("in_id", "idx_id")
  }

  test("drained stream gate equals the batch stream-static twin") {
    val streamed = StreamNearDup
      .gateToMemory(spark, sf001, queryName = "snd_spec_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = batchTwin.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty, "gate flagged nothing — test corpus too clean")
    assert(streamed == batch)
  }
}
