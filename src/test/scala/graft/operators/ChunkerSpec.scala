package graft.operators

import graft.GraftTestBase

class ChunkerSpec extends GraftTestBase {
  import spark.implicits._

  private def doc(n: Int) =
    Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")

  test("windows advance by stride and share exactly `overlap` tokens") {
    val got = Chunker.chunk(doc(10), "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 3, 4, "t4 t5 t6 t7"),
      (2, 6, 4, "t7 t8 t9 t10")))
  }

  test("a tail that would be pure overlap is never emitted") {
    // n=13, chunk=4, overlap=1, stride=3: start 12 would hold only t13,
    // which the start-9 window (t10..t13) already covers — the start
    // rule (start < n − overlap) drops it with coverage still complete
    val got = Chunker.chunk(doc(13), "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(got.map(_.getInt(2)).toSeq == Seq(0, 3, 6, 9))
    // full coverage: union of [start, start+n_tokens) is 0..13
    val covered = got.flatMap(r =>
      r.getInt(2) until (r.getInt(2) + r.getInt(3))).toSet
    assert(covered == (0 until 13).toSet)
  }

  test("short documents produce exactly one whole-doc chunk") {
    val got = Chunker.chunk(doc(3), "doc_id", "text",
        chunkTokens = 8, overlap = 2).collect()
    assert(got.length == 1)
    assert(got.head.getInt(3) == 3 && got.head.getString(4) == "t1 t2 t3")
  }

  test("zero overlap partitions the token stream exactly") {
    val got = Chunker.chunk(doc(9), "doc_id", "text",
        chunkTokens = 3, overlap = 0)
      .orderBy("chunk_idx").collect()
    assert(got.map(_.getInt(2)).toSeq == Seq(0, 3, 6))
    assert(got.map(_.getInt(3)).sum == 9)
  }
}
