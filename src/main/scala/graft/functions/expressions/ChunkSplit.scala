package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst table-generating function (UDTF): split a document
  * into fixed-size word windows, one output row per chunk.
  *
  *   chunk_split(text, n) → rows of (pos INT, chunk STRING)
  *
  * This is graft's Generator extension point — the row-producing sibling
  * of its scalar Expressions (SimHash64, RollingHash) and its typed
  * Aggregators (WeightedAvg, TopK). Spark plans it as a `GenerateExec`
  * over the child: fully distributed, streamed per input row, no
  * intermediate array materialization in the query plan (contrast the
  * composable `explode(sequence(...))` form in q114, which first builds
  * the offsets array per row).
  *
  * Semantics are pinned to the DuckDB oracle: words are `split(text,
  * ' ')` with empty tokens preserved (so an empty document yields one
  * chunk containing the empty string), chunks are `words[i*n ..
  * (i+1)*n)` joined with a single space, `pos` is the 0-based chunk
  * ordinal. Reference scope: the capstone has no generator surface at
  * all (SURVEY.md §2.8 — "no UDTFs anywhere"); this is the
  * training-pipeline extension that makes chunking first-class in SQL
  * via `LATERAL VIEW chunk_split(text, 64)`.
  *
  * `size` must be a foldable positive INT literal — enforced in
  * checkInputDataTypes so misuse fails at analysis time, not mid-job.
  */
case class ChunkSplit(text: Expression, size: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size)
  override def prettyName: String = "chunk_split"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("chunk_split: text must be STRING")
    else if (size.dataType != IntegerType || !size.foldable)
      TypeCheckResult.TypeCheckFailure("chunk_split: size must be an INT literal")
    else {
      val v = size.eval()
      if (v == null || v.asInstanceOf[Int] <= 0)
        TypeCheckResult.TypeCheckFailure("chunk_split: size must be > 0")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val n: Int = size.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Iterator.empty
    val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    val chunks = (words.length + n - 1) / n
    Iterator.tabulate(chunks) { i =>
      val chunk = words.slice(i * n, math.min((i + 1) * n, words.length))
        .mkString(" ")
      new GenericInternalRow(Array[Any](i, UTF8String.fromString(chunk)))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkSplit =
    copy(text = newChildren(0), size = newChildren(1))
}

object ChunkSplit {
  /** Column-API surface: `df.select($"doc_id", chunkSplit($"text", 64))`
    * expands to the generator's (pos, chunk) output columns. */
  def chunkSplit(text: Column, size: Column): Column =
    ColumnBridge.column(
      ChunkSplit(ColumnBridge.expression(text), ColumnBridge.expression(size)))
}
