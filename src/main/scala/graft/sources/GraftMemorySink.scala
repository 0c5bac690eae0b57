package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => swstreaming}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK connector ("graftmem"): the full batch write
  * contract — WriteBuilder → BatchWrite → DataWriterFactory →
  * DataWriter — over a named in-memory table, plus read-back.
  *
  * The commit protocol is the point: every write TASK buffers its rows
  * and ships them to the driver inside its WriterCommitMessage; nothing
  * becomes visible until the driver-side BatchWrite.commit installs ALL
  * task outputs in one atomic swap. A failed job calls abort() and the
  * table is untouched — the same all-or-nothing semantics a production
  * sink implements with staged files + a commit manifest at 100 TB
  * (this sink just keeps the staging in the message itself).
  *
  * SupportsTruncate maps SaveMode.Overwrite onto truncate-then-commit,
  * still atomically: the truncation happens inside commit(), never
  * before, so a failed overwrite leaves the previous table intact.
  *
  * Options: name (required) — the store key.
  */
class GraftMemorySink extends TableProvider {
  // Write-path-first source: schema comes from the written data or the
  // already-stored table on read-back.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMemoryStore.schemaOf(options.get("name")).getOrElse(new StructType())

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val name = properties.asScala.getOrElse("name",
      throw new IllegalArgumentException("graftmem requires option 'name'"))
    new GraftMemoryTable(name, schema)
  }
}

/** Driver-side store: table name → (schema, committed rows). Rows are
  * catalyst values (UTF8String etc.), grouped by writing task so tests
  * can also observe task granularity. */
object GraftMemoryStore {
  private val tables = TrieMap.empty[String, (StructType, Vector[Seq[Any]])]

  def schemaOf(name: String): Option[StructType] =
    Option(name).flatMap(tables.get).map(_._1)

  def rowsOf(name: String): Vector[Seq[Any]] =
    tables.get(name).map(_._2).getOrElse(Vector.empty)

  def drop(name: String): Unit = {
    tables.remove(name); epochs.remove(name); history.remove(name)
  }

  /** Streaming-epoch ledger: returns true the FIRST time an epoch is
    * committed for a table, false on replay — the idempotence hook. */
  private val epochs = TrieMap.empty[String, scala.collection.mutable.Set[Long]]
  private[sources] def markEpoch(name: String, epochId: Long): Boolean =
    epochs.synchronized {
      epochs.getOrElseUpdate(name,
        scala.collection.mutable.Set.empty[Long]).add(epochId)
    }

  private[sources] def install(name: String, schema: StructType,
                               rows: Vector[Seq[Any]], truncate: Boolean): Unit =
    tables.synchronized {
      val prior =
        if (truncate) Vector.empty
        else tables.get(name).map(_._2).getOrElse(Vector.empty)
      val next = prior ++ rows
      tables.put(name, (schema, next))
      history.updateWith(name) {
        case Some(h) => Some(h :+ (schema, next))
        case None    => Some(Vector((schema, next)))
      }
    }

  /** Optimistic-concurrency install: atomically verifies the table is
    * still at `expected` (the version a row-level-operation scan read)
    * before installing, under the same lock `install` takes — the
    * check-and-commit an Iceberg snapshot commit does against its base
    * snapshot id. Returns false (no install) on a version conflict. */
  private[sources] def installIfVersion(name: String, schema: StructType,
                                        rows: Vector[Seq[Any]],
                                        truncate: Boolean,
                                        expected: Option[Int]): Boolean =
    tables.synchronized {
      if (latestVersion(name) != expected) false
      else { install(name, schema, rows, truncate); true }
    }

  // ------------------------------------------------------- time travel
  /** Every committed install is a SNAPSHOT (version = commit ordinal,
    * 0-based) carrying the schema it was written under — so VERSION AS
    * OF reads stay correct across ALTER TABLE schema evolution. A
    * file-backed store keeps the same ledger as manifest files. */
  private val history =
    TrieMap.empty[String, Vector[(StructType, Vector[Seq[Any]])]]

  def latestVersion(name: String): Option[Int] =
    history.get(name).map(_.length - 1)

  def rowsAt(name: String, version: Int): Option[Vector[Seq[Any]]] =
    history.get(name).flatMap(_.lift(version)).flatMap(Option(_)).map(_._2)

  def schemaAt(name: String, version: Int): Option[StructType] =
    history.get(name).flatMap(_.lift(version)).flatMap(Option(_)).map(_._1)

  /** Snapshot retention: drop the payload of all but the newest
    * `keepLast` snapshots. Version NUMBERS are stable (the ledger keeps
    * tombstones), so `VERSION AS OF` on an expired version fails
    * cleanly instead of silently reading a different snapshot. Returns
    * the number of snapshots expired. */
  private[sources] def expireSnapshots(name: String, keepLast: Int): Int =
    tables.synchronized {
      history.get(name) match {
        case None => 0
        case Some(h) =>
          val cutoff = math.max(0, h.length - keepLast)
          val already = h.take(cutoff).count(_ == null)
          history.put(name, Vector.tabulate(h.length)(i =>
            if (i < cutoff) null else h(i)))
          cutoff - already
      }
    }
}

class GraftMemoryTable(name: String, writeSchema: StructType)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graftmem($name)"
  override def schema(): StructType =
    GraftMemoryStore.schemaOf(name).getOrElse(writeSchema)
  // ACCEPT_ANY_SCHEMA: the table takes its schema from each write (the
  // store is write-first); without it Spark validates against the
  // pre-write inferred schema, which is empty for a fresh table.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ, TableCapability.ACCEPT_ANY_SCHEMA,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemoryWriteBuilder(name, info.schema(), truncateFirst = false)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftMemoryScan(name)
}

class GraftMemoryWriteBuilder(name: String, schema: StructType,
                              truncateFirst: Boolean,
                              inputSchema: Option[StructType] = None,
                              finisher: Option[(Vector[Seq[Any]], Boolean)
                                => Vector[Seq[Any]]] = None)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftMemoryWriteBuilder(name, schema, truncateFirst = true,
      inputSchema, finisher)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftMemoryBatchWrite(name, schema, truncateFirst,
        inputSchema.getOrElse(schema), finisher)
    override def toStreaming: swstreaming.StreamingWrite =
      new GraftMemoryStreamingWrite(name, schema)
  }
}

/** Streaming write: each micro-batch epoch commits through the same
  * atomic install as a batch write, and the sink remembers which
  * epochs it has already committed — a RESTARTED query that replays
  * its last epoch (Structured Streaming's at-least-once commit window)
  * lands on the dedup check and becomes exactly-once, the same
  * batchId-keyed idempotence a production sink implements with a
  * committed-epoch manifest. */
class GraftMemoryStreamingWrite(name: String, schema: StructType)
    extends swstreaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): swstreaming.StreamingDataWriterFactory =
    new swstreaming.StreamingDataWriterFactory {
      private val factory = new GraftMemoryWriterFactory(schema)
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        factory.createWriter(partitionId, taskId)
    }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit =
    if (GraftMemoryStore.markEpoch(name, epochId)) {
      GraftMemoryStore.install(name, schema,
        messages.iterator.flatMap {
          case GraftMemoryCommit(rows) => rows
        }.toVector, truncate = false)
    }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = ()
}

/** Commit message = the task's buffered rows (the "staged files"). */
case class GraftMemoryCommit(rows: Vector[Seq[Any]]) extends WriterCommitMessage

/** `schema` is what the table stores; `inputSchema` is the layout of
  * the incoming rows, which may be wider (row-level-operation rewrites
  * prepend metadata columns like __row_operation) — stored columns are
  * picked out of the input BY NAME. */
class GraftMemoryBatchWrite(name: String, schema: StructType,
                            truncateFirst: Boolean,
                            inputSchema: StructType,
                            finisher: Option[(Vector[Seq[Any]], Boolean)
                              => Vector[Seq[Any]]] = None)
    extends BatchWrite {
  def this(name: String, schema: StructType, truncateFirst: Boolean) =
    this(name, schema, truncateFirst, schema)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftMemoryWriterFactory(inputSchema,
      schema.fieldNames.toSeq.map(inputSchema.fieldIndex))

  // Atomic install of every task's staged rows; truncate (overwrite)
  // only takes effect here, inside the commit. The finisher (identity
  // assignment / generated-column computation) runs HERE, driver-side,
  // so its values are part of the same atomic install.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.iterator.flatMap {
      case GraftMemoryCommit(rows) => rows
    }.toVector
    val finalRows =
      finisher.map(f => f(staged, truncateFirst)).getOrElse(staged)
    GraftMemoryStore.install(name, schema, finalRows, truncateFirst)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftMemoryWriterFactory(input: StructType, indices: Seq[Int])
    extends DataWriterFactory {
  def this(schema: StructType) = this(schema, schema.fields.indices)

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[Seq[Any]]
      // Copy every VALUE out of the incoming row: Spark reuses the
      // InternalRow (and the buffers UTF8String/ArrayData point into)
      // across rows — storing references would corrupt earlier rows as
      // later ones arrive (observed as truncated/overwritten strings
      // when writing from a parquet scan). Values are read through the
      // row as GIVEN, never via row.copy(): row-level-operation writes
      // deliver a ProjectingInternalRow view whose copy() materializes
      // the UNDERLYING unprojected row (metadata columns included),
      // which would shift every ordinal.
      override def write(row: InternalRow): Unit =
        buf += indices.map(i => copyVal(row.get(i, input(i).dataType)))

      // Row-level-operation carry-over rows arrive with their metadata
      // projection alongside the data row; the store is group-per-table
      // so the metadata (shard id) carries no information — keep data.
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)

      private def copyVal(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String      => s.clone()
        case a: org.apache.spark.sql.catalyst.util.ArrayData  => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData    => m.copy()
        case r: InternalRow                                   => r.copy()
        case other                                            => other
      }
      override def commit(): WriterCommitMessage = GraftMemoryCommit(buf.result())
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

class GraftMemoryScan(name: String) extends Scan with Batch {
  override def readSchema(): StructType =
    GraftMemoryStore.schemaOf(name).getOrElse(new StructType())
  override def toBatch: Batch = this
  override def description(): String = s"graftmem-scan $name"

  // Single partition: the store is driver-memory-backed by design (a
  // test/staging sink); a real store would shard here.
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRangePartition(0, 0))

  override def createReaderFactory(): PartitionReaderFactory = {
    val rows = GraftMemoryStore.rowsOf(name)
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val it = rows.iterator
          private var cur: Seq[Any] = _
          override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
          override def get(): InternalRow = InternalRow.fromSeq(cur)
          override def close(): Unit = ()
        }
    }
  }
}
