package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** Delta-based (merge-on-read) row-level write path: instead of
  * rewriting whole storage groups, the writer emits a log of
  * insert/update/delete operations keyed by the `_pos` row id, and the
  * driver applies the log atomically at commit. This is the
  * WriteDelta protocol — the merge-on-read half of the DML matrix,
  * next to the group-based ReplaceData (copy-on-write) half.
  *
  * At 100 TB the op log is what a format like Iceberg writes as
  * position-delete + data files; here the "files" are the commit
  * message and the compaction happens inline at commit.
  */
sealed trait GraftDeltaOp extends Serializable
case class GraftDeltaDelete(pos: Long) extends GraftDeltaOp
case class GraftDeltaUpdate(pos: Long, row: Seq[Any]) extends GraftDeltaOp
case class GraftDeltaInsert(row: Seq[Any]) extends GraftDeltaOp

case class GraftDeltaCommit(ops: Vector[GraftDeltaOp])
    extends WriterCommitMessage

class GraftDeltaWrite(storeKey: String, declared: StructType)
    extends DeltaWrite {

  override def toBatch(): DeltaBatchWrite = new DeltaBatchWrite {

    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DeltaWriterFactory =
      new GraftDeltaWriterFactory(declared)

    /** Atomic application of every task's op log: deletes and updates
      * resolve against the SCANNED snapshot's positions, inserts
      * append; one install publishes the result (and the snapshot
      * ledger gets a new version). */
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val ops = messages.iterator.flatMap {
        case GraftDeltaCommit(o) => o
      }.toVector
      val deletes = ops.collect { case GraftDeltaDelete(p) => p }.toSet
      val updates = ops.collect {
        case GraftDeltaUpdate(p, r) => p -> r
      }.toMap
      val inserts = ops.collect { case GraftDeltaInsert(r) => r }
      val cur = GraftMemoryStore.rowsOf(storeKey)
      val next = cur.zipWithIndex.flatMap { case (r, i) =>
        if (deletes.contains(i.toLong)) None
        else Some(updates.getOrElse(i.toLong, r))
      } ++ inserts
      GraftMemoryStore.install(storeKey, declared, next, truncate = true)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
}

class GraftDeltaWriterFactory(declared: StructType)
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val buf = Vector.newBuilder[GraftDeltaOp]

      private def copyRow(row: InternalRow): Seq[Any] =
        declared.fields.indices.map { i =>
          row.get(i, declared(i).dataType) match {
            case s: org.apache.spark.unsafe.types.UTF8String     => s.clone()
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
            case m: org.apache.spark.sql.catalyst.util.MapData   => m.copy()
            case r: InternalRow                                  => r.copy()
            case v                                               => v
          }
        }

      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        buf += GraftDeltaDelete(id.getLong(0))

      override def update(metadata: InternalRow, id: InternalRow,
                          row: InternalRow): Unit =
        buf += GraftDeltaUpdate(id.getLong(0), copyRow(row))

      override def insert(row: InternalRow): Unit =
        buf += GraftDeltaInsert(copyRow(row))

      override def commit(): WriterCommitMessage =
        GraftDeltaCommit(buf.result())
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
