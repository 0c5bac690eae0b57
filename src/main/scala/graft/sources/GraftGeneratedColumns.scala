package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.StructType

/** Identity and generated-column specs for catalog tables, applied at
  * the atomic COMMIT of every batch write.
  *
  * Spark's analyzer accepts the DDL (the catalog declares the
  * SUPPORTS_CREATE_TABLE_WITH_{GENERATED,IDENTITY}_COLUMNS
  * capabilities) and delivers the specs on the TableInfo create path;
  * VALUE PRODUCTION is the connector's job. Doing it inside the commit
  * keeps the contract exact:
  *
  *  - identity values are assigned under the store's single-writer
  *    install, so concurrent committed batches can never collide, and
  *    the counter resumes from the committed maximum (not a cached
  *    one) after any restart;
  *  - generated expressions are deterministic column arithmetic, so
  *    computing them at commit equals computing them in the write
  *    projection — a file-backed implementation would fold the same
  *    expression into the writer instead.
  *
  * Semantics follow the SQL standard: GENERATED ALWAYS AS (expr)
  * rejects explicit values that disagree with the expression;
  * GENERATED ALWAYS AS IDENTITY rejects explicit values outright;
  * BY DEFAULT identity keeps explicit values and the counter skips
  * past them.
  */
object GraftGeneratedColumns {

  sealed trait GenCol { def name: String }
  final case class IdentityCol(name: String, start: Long, step: Long,
                               allowExplicit: Boolean) extends GenCol
  final case class ComputedCol(name: String, exprSql: String) extends GenCol

  private val specs =
    TrieMap.empty[String, TrieMap[Identifier, Seq[GenCol]]]

  private[sources] def specsOf(cat: String) =
    specs.getOrElseUpdate(cat, TrieMap.empty[Identifier, Seq[GenCol]])

  /** Parse + bind a generation expression against the table schema:
    * column references become BoundReferences (case-insensitive), so
    * the expression evaluates directly against store rows. Supported
    * expressions are type-aligned column arithmetic / string functions
    * (no implicit coercion — the analyzer isn't run here). */
  private def bind(exprSql: String, schema: StructType): Expression =
    CatalystSqlParser.parseExpression(exprSql).transformUp {
      case a: UnresolvedAttribute =>
        val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
        if (i < 0) throw new IllegalArgumentException(
          s"generation expression references unknown column ${a.name}")
        BoundReference(i, schema(i).dataType, schema(i).nullable)
      case f: UnresolvedFunction =>
        // builtin scalar functions (upper, concat, abs, ...); children
        // are already bound because transformUp runs bottom-up
        FunctionRegistry.builtin.lookupFunction(
          FunctionIdentifier(f.nameParts.last), f.arguments)
    }

  /** Build the commit-time row finisher for a table, or None when the
    * table declares no identity/generated columns. The finisher runs
    * inside the atomic install: (stagedRows, truncating) => finalRows. */
  def finisher(cat: String, ident: Identifier, storeKey: String,
               schema: StructType)
      : Option[(Vector[Seq[Any]], Boolean) => Vector[Seq[Any]]] = {
    val cols = specsOf(cat).getOrElse(ident, Seq.empty)
    if (cols.isEmpty) return None
    Some { (rows, truncating) =>
      var out = rows
      cols.foreach {
        case IdentityCol(name, start, step, allowExplicit) =>
          val idx = schema.fieldIndex(name)
          // resume past every already-used value: committed rows
          // (unless this commit truncates) plus explicit values in
          // this batch — assigned under the single-writer install, so
          // concurrent commits cannot collide
          val used =
            (if (truncating) Vector.empty[Long]
             else GraftMemoryStore.rowsOf(storeKey)
               .flatMap(r => Option(r(idx)).map(_.asInstanceOf[Long]))) ++
              out.flatMap(r => Option(r(idx)).map(_.asInstanceOf[Long]))
          var next =
            if (used.isEmpty) start
            else if (step > 0) used.max + step
            else used.min + step
          out = out.map { r =>
            r(idx) match {
              case null =>
                val v = next; next += step
                r.updated(idx, v)
              case _ if !allowExplicit =>
                throw new IllegalArgumentException(
                  s"column $name is GENERATED ALWAYS AS IDENTITY; " +
                    "explicit inserts are not allowed")
              case _ => r // BY DEFAULT: keep the explicit value
            }
          }
        case ComputedCol(name, exprSql) =>
          val idx = schema.fieldIndex(name)
          val expr = bind(exprSql, schema)
          // store rows already hold catalyst-internal values
          // (UTF8String, Long, ...) — evaluate and store directly
          out = out.map { r =>
            val internal: InternalRow =
              new GenericInternalRow(r.toArray)
            val computed = expr.eval(internal)
            r(idx) match {
              case null => r.updated(idx, computed)
              case v if v == computed => r
              case v => throw new IllegalArgumentException(
                s"column $name is GENERATED ALWAYS AS ($exprSql); " +
                  s"explicit value $v contradicts computed $computed")
            }
          }
      }
      out
    }
  }
}
