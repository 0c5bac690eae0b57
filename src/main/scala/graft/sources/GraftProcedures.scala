package graft.sources

import java.util.Collections

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Stored procedures for the graft catalog (Spark 4 `CALL`).
  *
  * A procedure's result is itself a Scan — the engine plans it like any
  * relation, so procedure output composes with the rest of SQL.
  */
object GraftProcedures {

  /** CALL gcat.system.table_history('db.t') →
    * (version INT, n_rows BIGINT) per committed snapshot. */
  def tableHistory(cat: GraftCatalog): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "table_history"
    override def description(): String = "snapshot ledger of a catalog table"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "table_history"
      override def description(): String = "snapshot ledger of a catalog table"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("tbl",
          org.apache.spark.sql.types.StringType).build())
      override def isDeterministic: Boolean = false

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val ref = input.getUTF8String(0).toString
        val (ident, _) = cat.resolveTable(ref)
        val key = cat.storeKeyOf(ident)
        val latest = GraftMemoryStore.latestVersion(key).getOrElse(-1)
        // expired snapshots are tombstoned in the ledger - skip them
        val rows = (0 to latest).flatMap { v =>
          GraftMemoryStore.rowsAt(key, v)
            .map(r => Seq[Any](v, r.size.toLong))
        }.toVector
        Collections.singletonList(
          new InlineScan(
            StructType(Seq(
              org.apache.spark.sql.types.StructField("version", IntegerType),
              org.apache.spark.sql.types.StructField("n_rows", LongType))),
            rows): Scan).iterator()
      }
    }
  }

  /** CALL gcat.system.expire_snapshots('db.t', keep_last) → drops the
    * payload of all but the newest keep_last snapshots; version numbers
    * stay stable (tombstones), so expired VERSION AS OF reads fail
    * cleanly. Returns the count expired. */
  def expireSnapshots(cat: GraftCatalog): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "expire_snapshots"
    override def description(): String = "drop all but the newest N snapshots"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "expire_snapshots"
      override def description(): String = "drop all but the newest N snapshots"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("tbl",
          org.apache.spark.sql.types.StringType).build(),
        ProcedureParameter.in("keep_last", IntegerType).build())
      override def isDeterministic: Boolean = false

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val ref = input.getUTF8String(0).toString
        val keep = input.getInt(1)
        require(keep >= 1, "keep_last must be >= 1")
        val (ident, _) = cat.resolveTable(ref)
        val n = GraftMemoryStore.expireSnapshots(cat.storeKeyOf(ident), keep)
        Collections.singletonList(
          new InlineScan(
            StructType(Seq(
              org.apache.spark.sql.types.StructField("n_expired",
                IntegerType))),
            Vector(Seq[Any](n))): Scan).iterator()
      }
    }
  }

  /** CALL gcat.system.rollback('db.t', v) → restores snapshot v as the
    * new head (committed as a NEW snapshot — auditable, revertible). */
  def rollback(cat: GraftCatalog): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "rollback"
    override def description(): String = "restore a table to an old snapshot"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "rollback"
      override def description(): String = "restore a table to an old snapshot"
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("tbl",
          org.apache.spark.sql.types.StringType).build(),
        ProcedureParameter.in("version", IntegerType).build())
      override def isDeterministic: Boolean = false

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val ref = input.getUTF8String(0).toString
        val v = input.getInt(1)
        val (ident, schema) = cat.resolveTable(ref)
        val key = cat.storeKeyOf(ident)
        val rows = GraftMemoryStore.rowsAt(key, v).getOrElse(
          throw new IllegalArgumentException(
            s"version $v does not exist for $ref"))
        GraftMemoryStore.install(key, schema, rows, truncate = true)
        val newHead = GraftMemoryStore.latestVersion(key).get
        Collections.singletonList(
          new InlineScan(
            StructType(Seq(
              org.apache.spark.sql.types.StructField("restored_version",
                IntegerType),
              org.apache.spark.sql.types.StructField("new_head", IntegerType),
              org.apache.spark.sql.types.StructField("n_rows", LongType))),
            Vector(Seq[Any](v, newHead, rows.size.toLong))): Scan).iterator()
      }
    }
  }
}

/** Driver-local result relation of a procedure call (Spark requires
  * procedure output to be a LocalScan — the rows are already on the
  * driver, no distributed read needed). */
class InlineScan(schema: StructType, rowData: Vector[Seq[Any]])
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = schema
  override def description(): String = "graft-procedure-result"
  override def rows(): Array[InternalRow] =
    rowData.map(InternalRow.fromSeq).toArray
}
