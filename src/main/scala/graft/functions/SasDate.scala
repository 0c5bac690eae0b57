package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SAS-epoch date arithmetic as codegen-able built-ins.
  *
  * The reference converts SAS day offsets (days since 1960-01-01, stored as
  * double) to ISO strings through a row-at-a-time Python UDF
  * (`etl.py:255-257` `get_datetime`) — the single biggest perf anomaly in
  * the reference (SURVEY.md §3.1): every row crosses the JVM↔Python
  * boundary and the UDF blocks predicate pushdown. Here the same semantics
  * compose from `date_add`/`datediff`/`date_format`, which stay inside
  * whole-stage codegen.
  *
  * Quirk B5 (SURVEY.md §2.10): the reference UDF maps the falsy value 0.0
  * (a legitimate date, 1960-01-01 itself) to null. Default here treats 0 as
  * valid; pass `nullOnZero = true` for bit-compat with the reference.
  */
object SasDate {
  val EpochIso = "1960-01-01"

  private def epoch: Column = to_date(lit(EpochIso))

  /** SAS day-offset (numeric) → DateType. */
  def toDate(sasDays: Column): Column = date_add(epoch, sasDays.cast("int"))

  /** SAS day-offset → ISO-8601 string, as the reference UDF produced. */
  def toIsoString(sasDays: Column, nullOnZero: Boolean = false): Column = {
    val iso = date_format(toDate(sasDays), "yyyy-MM-dd")
    if (nullOnZero) when(sasDays.isNotNull && sasDays =!= 0, iso) else iso
  }

  /** DateType → SAS day-offset (int). */
  def fromDate(d: Column): Column = datediff(d, epoch)
}
