package graft.queries

/** Oracle SQL for queries DuckDB cannot recompute (Spark-only hashing
  * like xxhash64, FP-order-sensitive fits like KMeans): a committed
  * golden-parquet compare. One constant read_parquet branch per scale
  * factor, selected by the deterministic lineitem row count (6e3 / 6e4 /
  * 6e5 — documents/embeddings alone can't dispatch: sf0.001 and sf0.01
  * hold the same 500 rows). Constant table-function args keep DuckDB
  * happy; dead branches scan nothing after the count filter.
  *
  * Snapshots live in /root/repo/golden/<query>/sf<sf>.parquet,
  * regenerated ONLY via [[graft.tools.RegenGoldens]] and re-asserted
  * against live testdata on every `sbt test` by GoldenScaleSpec.
  */
object GoldenOracle {

  val sfCounts: Seq[(String, Long)] =
    Seq("0.001" -> 6000L, "0.01" -> 60000L, "0.1" -> 600000L)

  def sql(name: String, cols: String, orderBy: String): String =
    sfCounts
      .map { case (sf, n) =>
        s"""SELECT $cols FROM read_parquet('/root/repo/golden/$name/sf$sf.parquet')
           WHERE (SELECT count(*) FROM lineitem) = $n""" }
      .mkString("\nUNION ALL\n") + s"\nORDER BY $orderBy"
}
