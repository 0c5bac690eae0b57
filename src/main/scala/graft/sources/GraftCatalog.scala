package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.{And, Not, Or, Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsPushDownV2Filters}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 CATALOG plugin ("graft_catalog"): the full
  * TableCatalog + SupportsNamespaces contract over the same driver-side
  * store the graftmem sink writes to, so the WHOLE SQL DDL/DML surface
  * works against library-managed tables:
  *
  *   spark.conf: spark.sql.catalog.gcat = graft.sources.GraftCatalog
  *   CREATE NAMESPACE gcat.db
  *   CREATE TABLE gcat.db.t (k INT, v STRING)
  *   CREATE TABLE gcat.db.t2 AS SELECT ...          (CTAS)
  *   INSERT INTO / INSERT OVERWRITE gcat.db.t ...
  *   DELETE FROM gcat.db.t WHERE k < 5              (SupportsDeleteV2)
  *   TRUNCATE TABLE gcat.db.t
  *   SHOW TABLES IN gcat.db / DROP TABLE / ALTER TABLE ... RENAME
  *
  * Catalog metadata (namespaces, idents, declared schemas) lives in the
  * catalog instance's maps; rows commit through the SAME atomic
  * BatchWrite protocol as the sink (task-staged rows, driver-side
  * all-or-nothing install). At 100 TB the store swaps for files; every
  * interface here — and the Spark planning on top — is unchanged.
  *
  * DELETE pushdown: `canDeleteWhere` accepts a predicate tree of
  * comparisons / null-checks / AND / OR / NOT over top-level columns
  * and evaluates it driver-side against the committed rows; anything
  * richer is rejected at analysis (Spark then demands row-level-op
  * support rather than silently deleting wrong rows).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog {

  private var catalogName: String = _
  // Metadata lives in the companion, keyed by catalog name: Spark
  // re-instantiates catalog plugins per (cloned) session — streaming
  // foreachBatch, ML, thread-local sessions — and a metastore-backed
  // catalog would naturally share state across those instances.
  private def namespaces = GraftCatalog.namespacesOf(catalogName)
  private def tables = GraftCatalog.tablesOf(catalogName)
  private def modes = GraftCatalog.modesOf(catalogName)
  private def modeOf(ident: Identifier): String =
    modes.getOrElse(ident, "group")

  private def storeKey(ident: Identifier): String =
    s"cat:$catalogName:${(ident.namespace :+ ident.name).mkString(".")}"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    namespaces.putIfAbsent(Seq("default"), new util.HashMap[String, String]())
  }

  override def name(): String = catalogName

  /** Column DEFAULT values: Spark keeps the default expression in the
    * column metadata (CURRENT_DEFAULT / EXISTS_DEFAULT) and resolves it
    * at ANALYSIS time for INSERTs that omit the column — the connector
    * only has to preserve the schema metadata it was given at CREATE /
    * ALTER, which the ledger already does. */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  // ----------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    tables.keys.filter(_.namespace.sameElements(namespace)).toArray
  }

  private def tableConstraints =
    GraftCatalog.constraintsOf(catalogName)

  override def loadTable(ident: Identifier): Table =
    tables.get(ident) match {
      case Some(schema) =>
        new GraftCatalogTable(storeKey(ident), ident, schema,
          mode = modeOf(ident),
          declaredConstraints =
            tableConstraints.getOrElse(ident, Array.empty),
          rowFinisher = GraftGeneratedColumns.finisher(catalogName, ident,
            storeKey(ident), schema))
      case None         => throw new NoSuchTableException(ident)
    }

  /** CREATE TABLE with table-level CONSTRAINTs (Spark 4.1 TableInfo
    * path): constraints persist in catalog metadata; Spark itself
    * validates ENFORCED CHECK constraints on every INSERT (the write
    * plan gets a CheckInvariant guard), so the connector only stores
    * and republishes them via Table#constraints(). */
  override def createTable(ident: Identifier, info: TableInfo): Table = {
    createTable(ident, info.schema(), info.partitions(),
      info.properties())
    if (info.constraints() != null && info.constraints().nonEmpty)
      tableConstraints.put(ident, info.constraints())
    // identity / generated columns: capture the specs — values are
    // produced at commit time by GraftGeneratedColumns.finisher
    val gen = info.columns().toSeq.flatMap { c =>
      if (c.identityColumnSpec() != null) {
        val s = c.identityColumnSpec()
        Some(GraftGeneratedColumns.IdentityCol(c.name(), s.getStart,
          s.getStep, s.isAllowExplicitInsert))
      } else if (c.generationExpression() != null)
        Some(GraftGeneratedColumns.ComputedCol(c.name(),
          c.generationExpression()))
      else None
    }
    if (gen.nonEmpty)
      GraftGeneratedColumns.specsOf(catalogName).put(ident, gen)
    loadTable(ident)
  }

  /** Time travel: `SELECT ... FROM t VERSION AS OF n`. Every committed
    * write is a snapshot (version = commit ordinal, 0-based; version 0
    * is the empty table CREATE installs). The pinned table is read-only
    * — Spark rejects writes to time-travel relations before reaching
    * the connector. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val schema = tables.getOrElse(ident, throw new NoSuchTableException(ident))
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft catalog versions are integer commit ordinals, got '$version'")
    }
    val latest = GraftMemoryStore.latestVersion(storeKey(ident)).getOrElse(-1)
    if (v < 0 || v > latest) throw new IllegalArgumentException(
      s"version $v out of range [0, $latest] for $ident")
    // an expired (tombstoned) snapshot must FAIL here, not silently
    // fall back to the current rows at scan time
    val snapshotSchema = GraftMemoryStore.schemaAt(storeKey(ident), v)
      .getOrElse(throw new IllegalArgumentException(
        s"version $v of $ident has been expired (expire_snapshots)"))
    new GraftCatalogTable(storeKey(ident), ident, snapshotSchema, Some(v),
      mode = modeOf(ident))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tables.contains(ident)) throw new TableAlreadyExistsException(ident)
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    tables.put(ident, schema)
    // write.mode property: 'group' (copy-on-write ReplaceData, default)
    // or 'delta' (merge-on-read WriteDelta keyed by the _pos row id)
    modes.put(ident,
      Option(properties.get("write.mode")).getOrElse("group"))
    GraftMemoryStore.install(storeKey(ident), schema, Vector.empty,
      truncate = true)
    new GraftCatalogTable(storeKey(ident), ident, schema,
      mode = modeOf(ident))
  }

  /** Schema evolution: ADD COLUMN (appended, nullable), DROP COLUMN,
    * RENAME COLUMN. Existing rows are migrated in one atomic install —
    * which is also a new SNAPSHOT, so time travel before the ALTER
    * still reads the pre-evolution schema (per-version schemas in the
    * ledger). Type changes / nested fields are rejected. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val key = storeKey(ident)
    var schema = tables.getOrElse(ident, throw new NoSuchTableException(ident))
    var rows = GraftMemoryStore.rowsOf(key)
    changes.foreach {
      case add: TableChange.AddColumn if add.fieldNames.length == 1 =>
        schema = schema.add(add.fieldNames.head, add.dataType, nullable = true)
        rows = rows.map(_ :+ null)
      case del: TableChange.DeleteColumn if del.fieldNames.length == 1 =>
        val i = schema.fieldIndex(del.fieldNames.head)
        schema = StructType(schema.fields.patch(i, Nil, 1))
        rows = rows.map(r => r.patch(i, Nil, 1))
      case ren: TableChange.RenameColumn if ren.fieldNames.length == 1 =>
        val i = schema.fieldIndex(ren.fieldNames.head)
        schema = StructType(schema.fields.updated(i,
          schema.fields(i).copy(name = ren.newName)))
      case upd: TableChange.UpdateColumnDefaultValue
          if upd.fieldNames.length == 1 =>
        // ALTER COLUMN ... SET/DROP DEFAULT: only the CURRENT_DEFAULT
        // metadata changes — existing rows were materialized at write
        // time, so EXISTS_DEFAULT semantics don't apply here.
        val i = schema.fieldIndex(upd.fieldNames.head)
        val f = schema.fields(i)
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        val sqlText = upd.newDefaultValue()
        val newMeta =
          if (sqlText == null || sqlText.isEmpty)
            mb.remove("CURRENT_DEFAULT").build()
          else mb.putString("CURRENT_DEFAULT", sqlText).build()
        schema = StructType(schema.fields.updated(i, f.copy(metadata = newMeta)))
      case add: TableChange.AddConstraint =>
        val existing = tableConstraints.getOrElse(ident, Array.empty)
        if (existing.exists(_.name == add.constraint.name))
          throw new IllegalArgumentException(
            s"constraint ${add.constraint.name} already exists on $ident")
        tableConstraints.put(ident, existing :+ add.constraint)
      case drop: TableChange.DropConstraint =>
        val existing = tableConstraints.getOrElse(ident, Array.empty)
        if (!existing.exists(_.name == drop.name) && !drop.ifExists)
          throw new IllegalArgumentException(
            s"no constraint ${drop.name} on $ident")
        tableConstraints.put(ident, existing.filterNot(_.name == drop.name))
      case other => throw new UnsupportedOperationException(
        s"unsupported table change: $other")
    }
    tables.put(ident, schema)
    GraftMemoryStore.install(key, schema, rows, truncate = true)
    new GraftCatalogTable(key, ident, schema, mode = modeOf(ident),
      declaredConstraints = tableConstraints.getOrElse(ident, Array.empty))
  }

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(ident) match {
      case Some(_) =>
        modes.remove(ident); tableConstraints.remove(ident)
        GraftGeneratedColumns.specsOf(catalogName).remove(ident)
        GraftMemoryStore.drop(storeKey(ident)); true
      case None    => false
    }

  override def renameTable(oldIdent: Identifier, rawNewIdent: Identifier): Unit = {
    // ALTER TABLE cat.ns.a RENAME TO cat.ns.b delivers the target with
    // the catalog name still in its namespace; normalize so the stored
    // ident matches what loadTable later receives.
    val newIdent =
      if (rawNewIdent.namespace.headOption.contains(catalogName))
        Identifier.of(rawNewIdent.namespace.drop(1), rawNewIdent.name)
      else rawNewIdent
    val schema = tables.remove(oldIdent)
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (tables.contains(newIdent)) {
      tables.put(oldIdent, schema)
      throw new TableAlreadyExistsException(newIdent)
    }
    tables.put(newIdent, schema)
    tableConstraints.remove(oldIdent)
      .foreach(cs => tableConstraints.put(newIdent, cs))
    GraftGeneratedColumns.specsOf(catalogName).remove(oldIdent)
      .foreach(g => GraftGeneratedColumns.specsOf(catalogName)
        .put(newIdent, g))
    GraftMemoryStore.install(storeKey(newIdent), schema,
      GraftMemoryStore.rowsOf(storeKey(oldIdent)), truncate = true)
    GraftMemoryStore.drop(storeKey(oldIdent))
  }

  override def tableExists(ident: Identifier): Boolean = tables.contains(ident)

  // ------------------------------------------------------- procedures

  /** Stored procedures (Spark 4 `CALL` statement): maintenance verbs
    * that don't fit DML. `system.table_history(tbl)` lists the snapshot
    * ledger; `system.rollback(tbl, version)` RESTORES an old snapshot
    * by committing it as the new head (itself a new snapshot — history
    * is append-only, the rollback is auditable and revertible). */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array(Identifier.of(Array("system"), "table_history"),
        Identifier.of(Array("system"), "rollback"),
        Identifier.of(Array("system"), "expire_snapshots"))
    else Array.empty

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    val key = (ident.namespace.toSeq, ident.name)
    key match {
      case (Seq("system"), "table_history") => GraftProcedures.tableHistory(this)
      case (Seq("system"), "rollback")      => GraftProcedures.rollback(this)
      case (Seq("system"), "expire_snapshots") =>
        GraftProcedures.expireSnapshots(this)
      case _ => throw new IllegalArgumentException(s"no procedure $ident")
    }
  }

  // -------------------------------------------------------- functions

  /** DSv2 FunctionCatalog: `SELECT gcat.system.cents(x)` etc. The
    * analyzer binds against the actual argument schema (overloads and
    * arity/type errors surface at analysis time); bound scalars plan
    * through their `invoke` magic method, bound aggregates through
    * V2Aggregator with map-side partials. Implementations in
    * [[GraftCatalogFunctions]]. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      GraftCatalogFunctions.all.keys.toArray.sorted
        .map(Identifier.of(Array("system"), _))
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): functions.UnboundFunction =
    (ident.namespace.toSeq, ident.name) match {
      case (Seq("system"), n) if GraftCatalogFunctions.all.contains(n) =>
        GraftCatalogFunctions.all(n)
      case _ => throw new NoSuchFunctionException(ident)
    }

  /** Resolve a 'ns.table' string arg against this catalog's tables. */
  private[sources] def resolveTable(ref: String): (Identifier, StructType) = {
    val parts = ref.split('.')
    val ident = Identifier.of(parts.init, parts.last)
    (ident, tables.getOrElse(ident,
      throw new NoSuchTableException(ident)))
  }

  private[sources] def storeKeyOf(ident: Identifier): String = storeKey(ident)

  // ------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    namespaces.keys.map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespaces.contains(namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    namespaces.getOrElse(namespace.toSeq,
      throw new NoSuchNamespaceException(namespace))

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    if (namespaces.putIfAbsent(namespace.toSeq,
        new util.HashMap[String, String](metadata)).isDefined)
      throw new NamespaceAlreadyExistsException(namespace)

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace metadata is immutable")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val owned = tables.keys.filter(_.namespace.sameElements(namespace)).toSeq
    if (owned.nonEmpty && !cascade)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    owned.foreach(dropTable)
    namespaces.remove(namespace.toSeq).isDefined
  }
}

object GraftCatalog {
  private val allNamespaces =
    TrieMap.empty[String, TrieMap[Seq[String], util.Map[String, String]]]
  private val allTables =
    TrieMap.empty[String, TrieMap[Identifier, StructType]]
  private val allModes =
    TrieMap.empty[String, TrieMap[Identifier, String]]
  private val allConstraints =
    TrieMap.empty[String, TrieMap[Identifier, Array[constraints.Constraint]]]

  private[sources] def namespacesOf(cat: String) =
    allNamespaces.getOrElseUpdate(cat,
      TrieMap.empty[Seq[String], util.Map[String, String]])
  private[sources] def tablesOf(cat: String) =
    allTables.getOrElseUpdate(cat, TrieMap.empty[Identifier, StructType])
  private[sources] def modesOf(cat: String) =
    allModes.getOrElseUpdate(cat, TrieMap.empty[Identifier, String])
  private[sources] def constraintsOf(cat: String) =
    allConstraints.getOrElseUpdate(cat,
      TrieMap.empty[Identifier, Array[constraints.Constraint]])
}

/** Catalog-managed table: fixed declared schema (inserts analyze
  * against it — no ACCEPT_ANY_SCHEMA), read/write through the sink's
  * atomic commit protocol, plus filter-pushdown DELETE. */
class GraftCatalogTable(storeKey: String, ident: Identifier,
                        declared: StructType,
                        pinnedVersion: Option[Int] = None,
                        mode: String = "group",
                        declaredConstraints: Array[constraints.Constraint] =
                          Array.empty,
                        rowFinisher: Option[(Vector[Seq[Any]], Boolean)
                          => Vector[Seq[Any]]] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    declaredConstraints

  override def name(): String =
    ident.toString + pinnedVersion.map(v => s"@v$v").getOrElse("")
  override def schema(): StructType = declared

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  /** One hidden metadata column, `_shard`: the storage-group id (always
    * 0 here — one group per table). Its real job is protocol-level:
    * declaring it as a required metadata attribute of the row-level
    * operation makes Spark run the projecting write task, so the
    * DataWriter receives rows in the DATA schema instead of the
    * rewrite's internal [__row_operation, cols...] layout. A file-
    * backed store would surface the file/partition id here and use it
    * to replace only affected groups. */
  override def metadataColumns(): Array[MetadataColumn] = {
    val shard = new MetadataColumn {
      override def name(): String = "_shard"
      override def dataType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
      override def comment(): String = "storage group id (0: single group)"
    }
    // delta tables also expose the row POSITION — the row id the
    // WriteDelta protocol keys deletes/updates on (Iceberg's _pos)
    val pos = new MetadataColumn {
      override def name(): String = "_pos"
      override def dataType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row position in the current snapshot"
    }
    if (mode == "delta") Array(shard, pos) else Array(shard)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCatalogScanBuilder(storeKey, declared, pinnedVersion)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemoryWriteBuilder(storeKey, declared, truncateFirst = false,
      finisher = rowFinisher)

  /** Group-based row-level operations (UPDATE / MERGE INTO / complex
    * DELETE): the whole table is ONE group, so Spark's rewrite reads
    * every row, applies assignments/merge actions in the query plan,
    * and the replacement write is truncate-and-install — atomic through
    * the same BatchWrite commit as every other write. Simple DELETEs
    * still take the deleteWhere metadata fast path (Spark's
    * OptimizeMetadataOnlyDeleteFromTable picks it when canDeleteWhere
    * accepts); a file-backed store would report per-file groups here
    * and replace only affected files. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    if (mode == "delta") () => new org.apache.spark.sql.connector.write.SupportsDelta {
      // merge-on-read: the rewrite emits a positional op log (insert /
      // update / delete keyed by _pos) instead of replacing the group.
      // The operation pins the snapshot version ONCE at plan time: the
      // rewrite scan reads exactly that snapshot, and the delta commit
      // validates the table is still at it (optimistic concurrency) —
      // positions are only meaningful against the scanned snapshot.
      private val scannedVersion: Option[Int] =
        GraftMemoryStore.latestVersion(storeKey)
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new GraftCatalogScanBuilder(storeKey, declared,
          pinnedVersion = scannedVersion, acceptFilters = false)
      override def newWriteBuilder(lwi: LogicalWriteInfo): org.apache.spark.sql.connector.write.DeltaWriteBuilder =
        new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
          override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
            new GraftDeltaWrite(storeKey, declared, scannedVersion)
        }
      override def rowId(): Array[NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .column("_pos"))
      override def requiredMetadataAttributes(): Array[NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .column("_shard"))
      override def description(): String =
        s"graft-rlo-delta[${info.command()}] $storeKey"
    }
    else () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new GraftCatalogScanBuilder(storeKey, declared,
          acceptFilters = false)
      override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder =
        new GraftMemoryWriteBuilder(storeKey, declared, truncateFirst = true,
          inputSchema = Some(lwi.schema()))
      override def requiredMetadataAttributes(): Array[NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .column("_shard"))
      override def description(): String =
        s"graft-rlo[${info.command()}] $storeKey"
    }

  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => PredicateEval.compile(p, declared).isDefined)

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    val evals = predicates.map(p => PredicateEval.compile(p, declared).get)
    val keep = GraftMemoryStore.rowsOf(storeKey)
      .filterNot(row => evals.forall(_(row)))
    GraftMemoryStore.install(storeKey, declared, keep, truncate = true)
  }
}

/** Column-pruning scan over the store that can also materialize the
  * `_shard` metadata column (constant 0: one storage group). Pruning
  * matters twice: normal reads project only requested columns, and
  * row-level-operation scans request data columns + `_shard`, which is
  * what switches Spark onto the projecting write task. */
class GraftCatalogScanBuilder(storeKey: String, declared: StructType,
                              pinnedVersion: Option[Int] = None,
                              acceptFilters: Boolean = true)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownV2Filters {
  private var required: StructType = declared
  private var pushed: Array[Predicate] = Array.empty
  private var evals: Array[PredicateEval.RowPred] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept exactly the fragment PredicateEval compiles (comparisons /
    * null tests / AND / OR / NOT over top-level columns); everything
    * else stays a post-scan Filter in the Spark plan. Pushed rows are
    * dropped at the READER, so only matching rows ever cross the
    * store→executor boundary — the connector analogue of parquet
    * row-group skipping.
    *
    * `acceptFilters = false` on ROW-LEVEL-OPERATION scans: there the
    * pushed condition selects storage GROUPS, not rows — the rewrite
    * must read every row of an affected group (carry-over rows
    * included) because the replacement write swaps whole groups. With
    * one group per table, row-filtering the rewrite scan would DROP
    * every non-matching row from the table; refusing the pushdown
    * keeps the condition as a plan-side Filter over the full scan. */
  override def pushPredicates(predicates: Array[Predicate]): Array[Predicate] = {
    if (!acceptFilters) return predicates
    val (ok, rest) = predicates.partition(p =>
      PredicateEval.compile(p, declared).isDefined)
    pushed = ok
    evals = ok.flatMap(p => PredicateEval.compile(p, declared))
    rest
  }

  override def pushedPredicates(): Array[Predicate] = pushed

  override def build(): Scan = new Scan with Batch
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-catalog-scan $storeKey ${required.fieldNames.mkString(",")}" +
        (if (pushed.nonEmpty)
           s" PushedFilters: [${pushed.mkString(", ")}]"
         else "")

    /** Exact store statistics → Spark's size estimation: a small
      * catalog table joins as the BROADCAST side without hints, the
      * same way parquet relations broadcast from file sizes. Size is a
      * conservative per-cell estimate (the store holds boxed catalyst
      * values; what matters is the order of magnitude vs the 10 MB
      * broadcast threshold). */
    override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
      new org.apache.spark.sql.connector.read.Statistics {
        private val n = pinnedVersion
          .flatMap(GraftMemoryStore.rowsAt(storeKey, _))
          .getOrElse(GraftMemoryStore.rowsOf(storeKey)).size
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.of(n.toLong * required.size * 24L)
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.of(n.toLong)
      }

    override def planInputPartitions(): Array[InputPartition] =
      Array(GraftRangePartition(0, 0))

    override def createReaderFactory(): PartitionReaderFactory = {
      val all = pinnedVersion
        .flatMap(GraftMemoryStore.rowsAt(storeKey, _))
        .getOrElse(GraftMemoryStore.rowsOf(storeKey))
      // pushed predicates drop rows here, before they reach Spark
      val rows =
        if (evals.isEmpty) all else all.filter(r => evals.forall(_(r)))
      // -1 = _shard (constant 0), -2 = _pos (running row index)
      val picks: Seq[Int] = required.fields.toSeq.map { f =>
        if (f.name == "_shard") -1
        else if (f.name == "_pos") -2
        else declared.fieldIndex(f.name)
      }
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
          new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
            private val it = rows.iterator
            private var cur: Seq[Any] = _
            private var pos: Long = -1L
            override def next(): Boolean = {
              val h = it.hasNext; if (h) { cur = it.next(); pos += 1 }; h
            }
            override def get(): org.apache.spark.sql.catalyst.InternalRow =
              org.apache.spark.sql.catalyst.InternalRow.fromSeq(
                picks.map {
                  case -1 => 0
                  case -2 => pos
                  case i  => cur(i)
                })
            override def close(): Unit = ()
          }
      }
    }
  }
}

/** Compiles a V2 connector Predicate tree into a row evaluator over the
  * store's catalyst-value rows. Returns None for anything outside the
  * supported fragment, which makes canDeleteWhere reject the DELETE at
  * analysis instead of guessing. */
object PredicateEval {
  type RowPred = Seq[Any] => Boolean

  def compile(p: Predicate, schema: StructType): Option[RowPred] = p match {
    case and: And =>
      for (l <- compile(and.left(), schema); r <- compile(and.right(), schema))
        yield (row: Seq[Any]) => l(row) && r(row)
    case or: Or =>
      for (l <- compile(or.left(), schema); r <- compile(or.right(), schema))
        yield (row: Seq[Any]) => l(row) || r(row)
    case not: Not =>
      compile(not.child(), schema).map(f => (row: Seq[Any]) => !f(row))
    case _ =>
      p.name() match {
        case "ALWAYS_TRUE"  => Some(_ => true)
        case "ALWAYS_FALSE" => Some(_ => false)
        case "IS_NULL" => fieldRef(p, 0, schema).map(i => row => row(i) == null)
        case "IS_NOT_NULL" =>
          fieldRef(p, 0, schema).map(i => row => row(i) != null)
        case op @ ("=" | "<>" | "<" | "<=" | ">" | ">=") =>
          for {
            i <- fieldRef(p, 0, schema)
            lit <- literal(p, 1)
            if comparable(schema.fields(i).dataType, lit)
          } yield (row: Seq[Any]) => {
            val v = row(i)
            if (v == null) false
            else {
              val c = cmp(v, lit)
              op match {
                case "="  => c == 0
                case "<>" => c != 0
                case "<"  => c < 0
                case "<=" => c <= 0
                case ">"  => c > 0
                case ">=" => c >= 0
              }
            }
          }
        case _ => None
      }
  }

  private def fieldRef(p: Predicate, idx: Int,
                       schema: StructType): Option[Int] =
    p.children().lift(idx).collect {
      case r: NamedReference if r.fieldNames.length == 1 &&
          schema.fieldNames.contains(r.fieldNames.head) =>
        schema.fieldIndex(r.fieldNames.head)
    }

  private def literal(p: Predicate, idx: Int): Option[Any] =
    p.children().lift(idx).collect {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] => l.value
    }

  /** Compile-time gate: only (column type, literal class) pairs with a
    * well-defined EXACT comparison are pushed; anything else returns
    * None so Spark keeps the filter (scan path) or rejects the
    * metadata-only DELETE (canDeleteWhere). A doubleValue() shortcut
    * here would silently corrupt BIGINT comparisons above 2^53. */
  private def comparable(dt: org.apache.spark.sql.types.DataType,
                         lit: Any): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | DateType | TimestampType |
           TimestampNTZType => lit.isInstanceOf[Number]
      case _: DecimalType => lit.isInstanceOf[Decimal]
      case StringType =>
        lit.isInstanceOf[UTF8String] || lit.isInstanceOf[String]
      case BooleanType => lit.isInstanceOf[java.lang.Boolean]
      case _ => false
    }
  }

  private def isIntegral(n: Any): Boolean =
    n.isInstanceOf[java.lang.Byte] || n.isInstanceOf[java.lang.Short] ||
      n.isInstanceOf[java.lang.Integer] || n.isInstanceOf[java.lang.Long]

  /** Exact decimal view of a numeric: doubles/floats expand to their
    * exact binary value, integrals to their exact long value. */
  private def exact(n: Number): java.math.BigDecimal = n match {
    case d: java.lang.Double => new java.math.BigDecimal(d.doubleValue())
    case f: java.lang.Float  => new java.math.BigDecimal(f.doubleValue())
    case other               => java.math.BigDecimal.valueOf(other.longValue())
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    // integral × integral: exact Long arithmetic (never via double —
    // 9007199254740993L == 2^53 + 1 would collapse onto its neighbor)
    case (x: Number, y: Number) if isIntegral(x) && isIntegral(y) =>
      java.lang.Long.compare(x.longValue(), y.longValue())
    // mixed integral/fractional: exact BigDecimal comparison
    case (x: Number, y: Number)
        if x.isInstanceOf[java.lang.Double] || x.isInstanceOf[java.lang.Float] ||
           y.isInstanceOf[java.lang.Double] || y.isInstanceOf[java.lang.Float] =>
      if ((x.isInstanceOf[java.lang.Double] || x.isInstanceOf[java.lang.Float]) &&
          (y.isInstanceOf[java.lang.Double] || y.isInstanceOf[java.lang.Float]))
        java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      else exact(x).compareTo(exact(y))
    case (x: org.apache.spark.sql.types.Decimal,
          y: org.apache.spark.sql.types.Decimal) =>
      x.toJavaBigDecimal.compareTo(y.toJavaBigDecimal)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: UTF8String, y: String)     => x.toString.compareTo(y)
    case (x: Boolean, y: Boolean)       => java.lang.Boolean.compare(x, y)
    case (x, y) => throw new IllegalStateException(
      s"unpushable comparison reached eval: ${x.getClass} vs ${y.getClass}")
  }
}
